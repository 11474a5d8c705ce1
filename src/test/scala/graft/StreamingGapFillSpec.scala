package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, max}
import graft.streaming.StreamingGapFill

class StreamingGapFillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  // key 1: observations in hours 10, 10, 13, 14 (gap 11-12 fills from
  // hour 10's LAST obs), then 17 (gap 15-16). key 2: hours 10, 12.
  private val series: Seq[(Long, Long, Timestamp, Double)] = Seq(
    (1L, 1L, ts(10, 5), 1.0), (1L, 2L, ts(10, 40), 2.5),
    (1L, 3L, ts(13), 7.0), (1L, 4L, ts(14, 59), 9.0),
    (1L, 5L, ts(17, 1), 4.0),
    (2L, 20L, ts(10), 100.0), (2L, 21L, ts(12), 50.0))

  private def runStream(batches: Seq[Seq[(Long, Long, Timestamp, Double)]],
                        name: String): Set[(Long, Timestamp, Double, Boolean)] = {
    val stream = MemoryStream[(Long, Long, Timestamp, Double)](spark)
    val q = StreamingGapFill.gapFill(
        stream.toDF().toDF("user_id", "event_id", "ts", "value"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2), r.getBoolean(3))).toSet
    } finally q.stop()
  }

  test("streaming gap-fill == batch minus each key's open tail bucket; batch-split invariance") {
    val oneBatch = runStream(Seq(series), "sg_one")
    val threeBatches = runStream(
      Seq(series.take(2), series.slice(2, 5), series.drop(5)), "sg_three")
    assert(oneBatch == threeBatches,
      s"micro-batch boundaries changed the panel: " +
        s"${(oneBatch diff threeBatches).take(3)} vs ${(threeBatches diff oneBatch).take(3)}")
    val batchAll = graft.operators.Temporal.gapFillForwardFill(
        series.toDF("user_id", "event_id", "ts", "value"))
    // the stream's contract: every bucket except each key's still-open last
    val tail = batchAll.groupBy("user_id").agg(max("w").as("w"))
    val expected = batchAll.join(tail, Seq("user_id", "w"), "left_anti")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2), r.getBoolean(3))).toSet
    assert(oneBatch == expected,
      s"stream/batch divergence: stream-only=${(oneBatch diff expected).take(3)} " +
        s"batch-only=${(expected diff oneBatch).take(3)}")
    // sanity on semantics: hour 11 forward-fills hour 10's LAST obs (2.5)
    assert(oneBatch.contains((1L, ts(11), 2.5, true)), oneBatch.toString)
    // and an observed bucket keeps its own last value, unfilled
    assert(oneBatch.contains((1L, ts(13), 7.0, false)), oneBatch.toString)
  }

  test("a bucket jump past maxBucketsPerKey fails loudly instead of fanning out") {
    val stream = MemoryStream[(Long, Long, Timestamp, Double)](spark)
    val q = StreamingGapFill.gapFill(
        stream.toDF().toDF("user_id", "event_id", "ts", "value"),
        maxBucketsPerKey = 4L)
      .writeStream.format("memory").queryName("sg_guard").outputMode("append").start()
    try {
      stream.addData((1L, 1L, ts(0), 1.0), (1L, 2L, ts(10), 2.0))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("maxBucketsPerKey")), e.toString)
    } finally q.stop()
  }

  test("late rows into a closed bucket are dropped; open-bucket state survives in between") {
    val stream = MemoryStream[(Long, Long, Timestamp, Double)](spark)
    val q = StreamingGapFill.gapFill(
        stream.toDF().toDF("user_id", "event_id", "ts", "value"))
      .writeStream.format("memory").queryName("sg_late").outputMode("append").start()
    try {
      stream.addData((1L, 1L, ts(10), 1.0), (1L, 2L, ts(12), 3.0))
      q.processAllAvailable()
      // hour 10 closed (emitted with 1.0) — a late row for it must not re-emit
      stream.addData((1L, 3L, ts(10, 30), 999.0))
      q.processAllAvailable()
      // hour 12 is still open: closing it now must carry 3.0, not 999.0
      stream.addData((1L, 4L, ts(13), 5.0))
      q.processAllAvailable()
      val got = spark.table("sg_late").collect()
        .map(r => (r.getTimestamp(1), r.getDouble(2), r.getBoolean(3))).toSet
      assert(got == Set(
        (ts(10), 1.0, false), (ts(11), 1.0, true), (ts(12), 3.0, false)), got.toString)
    } finally q.stop()
  }
}
