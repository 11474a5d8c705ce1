package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Sketches
import graft.streaming.StreamingIngest

/** The stored seen-filter probed from a STREAM (StreamingIngest): bloom
  * drops everything history already has with zero state rows; the
  * watermarked within-stream dedup catches repeats the filter predates. */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  case class Doc(doc_id: Long, text: String, ts: Timestamp)
  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("streamed ingest == batch twin: bloom drops history, state drops in-flight repeats") {
    // yesterday's batch: ten documents whose keys become the stored filter
    val history = (0L until 10L).map(i => (i, s"historic document number $i"))
      .toDF("doc_id", "text")
    val seen = Sketches.buildSeenFilter(
      history.select(md5(col("text")).as("k")), "k",
      expectedItems = 1000L, numBits = 20000L)

    val stream = MemoryStream[Doc](spark)
    val accepted = StreamingIngest.acceptNew(
      stream.toDF().withWatermark("ts", "10 seconds"), seen)
    val q = accepted.writeStream.format("memory")
      .queryName("ingest_out").outputMode("append").start()
    try {
      stream.addData(
        Doc(100L, "historic document number 3", ts(1)), // seen before the stream
        Doc(101L, "a genuinely new document arrives", ts(2)),
        Doc(102L, "another brand new one shows up", ts(3)))
      q.processAllAvailable()
      stream.addData(
        Doc(103L, "a genuinely new document arrives", ts(4)), // repeat of 101, in-flight
        Doc(104L, "historic document number 7", ts(5)),       // seen before the stream
        Doc(105L, "third distinct novel document here", ts(6)))
      q.processAllAvailable()

      val got = spark.table("ingest_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(got == Set(101L, 102L, 105L),
        s"accepted set diverged: $got")
    } finally q.stop()

    // batch twin on the same six docs: exact anti-join + distinct-by-key
    val batch = Seq(
      (100L, "historic document number 3"), (101L, "a genuinely new document arrives"),
      (102L, "another brand new one shows up"), (103L, "a genuinely new document arrives"),
      (104L, "historic document number 7"), (105L, "third distinct novel document here"))
      .toDF("doc_id", "text").withColumn("k", md5(col("text")))
    val twin = batch
      .join(history.select(md5(col("text")).as("k")).distinct(), Seq("k"), "left_anti")
      .groupBy("k").agg(min("doc_id").as("doc_id"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(twin == Set(101L, 102L, 105L), "the batch twin must accept the same set")
  }

  test("an empty history admits everything new (null filter, zero state surprises)") {
    val stream = MemoryStream[Doc](spark)
    val emptyHistory = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    val seen = Sketches.buildSeenFilter(
      emptyHistory.select(md5(col("text")).as("k")), "k", 10L, 1000L)
    val q = StreamingIngest.acceptNew(
      stream.toDF().withWatermark("ts", "10 seconds"), seen)
      .writeStream.format("memory").queryName("ingest_empty").outputMode("append").start()
    try {
      stream.addData(Doc(1L, "first ever", ts(1)), Doc(2L, "second ever", ts(2)))
      q.processAllAvailable()
      assert(spark.table("ingest_empty").count() == 2,
        "an empty seen-set must not reject the first batch")
    } finally q.stop()
  }
}
