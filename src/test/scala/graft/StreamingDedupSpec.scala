package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.DocEvent

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("near-dup arriving in a LATER batch is flagged against earlier state") {
    val stream = MemoryStream[DocEvent](spark)
    val q = StreamingDedup.nearDupHits(stream.toDF(), minJ = 0.5)
      .writeStream.format("memory").queryName("dup_hits").outputMode("update").start()
    try {
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      stream.addData(
        DocEvent(1L, base),
        DocEvent(2L, "totally different words live in this one here now friend"))
      q.processAllAvailable()
      assert(spark.table("dup_hits").count() == 0, "no dups yet")

      stream.addData(
        DocEvent(3L, base),                                       // exact dup of 1
        DocEvent(4L, base.replace("kappa", "lambda")),            // near dup of 1/3
        DocEvent(5L, "yet another unrelated pile of words goes right here today"))
      q.processAllAvailable()

      val hits = spark.table("dup_hits").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pairs = hits.map { case (a, b, _) => (a, b) }
      assert(pairs.contains((3L, 1L)), s"exact dup missed: $hits")
      assert(hits.filter { case (a, b, _) => (a, b) == ((3L, 1L)) }
        .forall(_._3 == 1.0), "exact dup must have estimated J = 1.0")
      assert(pairs.exists { case (a, b) => a == 4L && (b == 1L || b == 3L) },
        s"near dup missed: $hits")
      assert(!pairs.exists { case (a, b) => Set(a, b).intersect(Set(2L, 5L)).nonEmpty },
        s"unrelated doc flagged: $hits")
    } finally q.stop()
  }

  test("bucket state is bounded: FIFO eviction keeps at most maxPerBucket residents") {
    val stream = MemoryStream[DocEvent](spark)
    // tiny cap: with 3 identical docs and cap 2, the oldest is evicted
    val q = StreamingDedup.nearDupHits(stream.toDF(), minJ = 0.9, maxPerBucket = 2)
      .writeStream.format("memory").queryName("dup_hits_cap").outputMode("update").start()
    try {
      val base = "one two three four five six seven eight nine ten"
      stream.addData(DocEvent(10L, base)); q.processAllAvailable()
      stream.addData(DocEvent(11L, base)); q.processAllAvailable()
      stream.addData(DocEvent(12L, base)); q.processAllAvailable()
      val pairs = spark.table("dup_hits_cap").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // 11 sees 10; 12 sees 11 and 10-or-evicted; all hits are among these
      assert(pairs.contains((11L, 10L)))
      assert(pairs.contains((12L, 11L)))
    } finally q.stop()
  }
}
