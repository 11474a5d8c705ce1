package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{DocEvent, DocEventTs}

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

  test("event-time TTL expires idle bucket keys once the watermark passes") {
    val stream = MemoryStream[DocEventTs](spark)
    def at(hhmm: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")
    val docs = stream.toDF().withWatermark("ts", "0 seconds")
    val q = StreamingDedup.nearDupHits(docs, minJ = 0.9,
      stateTtlMs = 60L * 60 * 1000) // 1 hour
      .writeStream.format("memory").queryName("dup_ttl").outputMode("update").start()
    def stateRows: Long = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
    try {
      // doc 1 opens 16 bucket keys with expiry 10:00 + 1h
      stream.addData(DocEventTs(1L,
        "alpha beta gamma delta epsilon zeta eta theta iota kappa", at("10:00")))
      q.processAllAvailable()
      val s1 = stateRows
      assert(s1 > 0, "expected bucket state after the first batch")
      // doc 2's novel content opens its own ~16 keys AND lifts the
      // watermark to 20:00 — past doc 1's 11:00 expiry. processAllAvailable
      // drains the follow-up timeout batch too, so by the time we measure,
      // doc 1's keys are gone: without the TTL this would read 2×s1.
      stream.addData(DocEventTs(2L,
        "totally different words live in this one here now friend", at("20:00")))
      q.processAllAvailable()
      val s2 = stateRows
      assert(s2 <= s1, s"doc 1's idle buckets did not expire: $s1 -> $s2")
      // doc 3 at 20:05 keeps the watermark short of doc 2's 21:00 expiry:
      // doc 2 (still fresh) survives, doc 3 adds its keys — state stays
      // bounded by the TTL horizon, not by stream length
      stream.addData(DocEventTs(3L,
        "yet another unrelated pile of words goes right here today", at("20:05")))
      q.processAllAvailable()
      val s3 = stateRows
      assert(s3 <= 2 * s1, s"state grew past the TTL horizon: $s1 -> $s2 -> $s3")
    } finally q.stop()
  }
}
