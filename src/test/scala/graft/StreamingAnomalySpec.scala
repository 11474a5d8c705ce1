package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingAnomaly

class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  private val planted: Seq[(Long, Long, Timestamp, Double)] = Seq(
    (1L, 1L, ts(0), 10.0), (1L, 2L, ts(1), 11.0), (1L, 3L, ts(2), 10.0),
    (1L, 4L, ts(3), 11.0), (1L, 5L, ts(4), 10.0), (1L, 6L, ts(5), 100.0),
    (1L, 7L, ts(6), 10.0), // post-spike normal: spike inflates baseline sigma
    (2L, 8L, ts(0), 5.0), (2L, 9L, ts(1), 5.0), (2L, 10L, ts(2), 5.0))

  private def runStream(batches: Seq[Seq[(Long, Long, Timestamp, Double)]],
                        name: String): Set[(Long, Long, Double)] = {
    val stream = MemoryStream[(Long, Long, Timestamp, Double)](spark)
    val q = StreamingAnomaly.anomalies(
        stream.toDF().toDF("user_id", "event_id", "ts", "value"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    } finally q.stop()
  }

  test("flags the planted spike; batch-split invariance; matches the batch twin") {
    val oneBatch = runStream(Seq(planted), "sa_one")
    val threeBatches = runStream(
      Seq(planted.take(4), planted.slice(4, 7), planted.drop(7)), "sa_three")
    assert(oneBatch == threeBatches,
      s"micro-batch boundaries changed the flags: $oneBatch vs $threeBatches")
    // the batch operator on the same rows is the ground truth
    val batch = graft.operators.Temporal.rollingAnomalies(
        planted.toDF("user_id", "event_id", "ts", "value"), lookback = 20, zThresh = 2.5)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    assert(oneBatch == batch, s"stream $oneBatch != batch $batch")
    // and the spike is what got flagged
    assert(oneBatch.map(_._2) == Set(6L), oneBatch.toString)
  }

  test("state window slides: after `lookback` newer values, an old spike stops skewing") {
    // lookback 3: by the time event 7 scores, the window is (11, 10, 100)
    // — wide sigma, not flagged; event 8 sees (10, 100, 12) etc.
    val rows = Seq(
      (1L, 1L, ts(0), 10.0), (1L, 2L, ts(1), 11.0), (1L, 3L, ts(2), 10.0),
      (1L, 4L, ts(3), 11.0), (1L, 5L, ts(4), 100.0),
      (1L, 6L, ts(5), 10.0), (1L, 7L, ts(6), 12.0), (1L, 8L, ts(7), 11.0),
      (1L, 9L, ts(8), 10.5), (1L, 10L, ts(9), 11.5))
    val stream = MemoryStream[(Long, Long, Timestamp, Double)](spark)
    val q = StreamingAnomaly.anomalies(
        stream.toDF().toDF("user_id", "event_id", "ts", "value"),
        lookback = 3, zThresh = 2.5)
      .writeStream.format("memory").queryName("sa_slide").outputMode("append").start()
    val got = try {
      stream.addData(rows: _*); q.processAllAvailable()
      spark.table("sa_slide").collect().map(_.getLong(1)).toSet
    } finally q.stop()
    assert(got.contains(5L), s"spike must flag: $got")
    // once the spike leaves the 3-value window (events 9+ see post-spike
    // values only), calm rows stop being flagged against a stale sigma
    assert(!got.contains(9L) && !got.contains(10L), got.toString)
  }

  test("event-time TTL expires idle keys: a returning key restarts its baseline") {
    val stream = MemoryStream[(Long, Long, Timestamp, Double)](spark)
    val q = StreamingAnomaly.anomalies(
        stream.toDF().toDF("user_id", "event_id", "ts", "value")
          .withWatermark("ts", "0 seconds"),
        lookback = 20, zThresh = 2.5, stateTtlMs = 60000L)
      .writeStream.format("memory").queryName("sa_ttl").outputMode("append").start()
    try {
      // key 1 builds a tight baseline, then goes idle past the TTL
      stream.addData((1L, 1L, ts(0), 10.0), (1L, 2L, ts(0, 10), 11.0),
        (1L, 3L, ts(0, 20), 10.0), (2L, 90L, ts(0), 1.0))
      q.processAllAvailable()
      stream.addData((2L, 91L, ts(10), 1.0)) // advance watermark 10 min
      q.processAllAvailable()
      // key 1 returns with a value that WOULD have flagged against the
      // old baseline — but state expired, so it scores against nothing
      stream.addData((1L, 4L, ts(11), 99.0))
      q.processAllAvailable()
      val got = spark.table("sa_ttl").collect().map(_.getLong(1)).toSet
      assert(!got.contains(4L),
        s"expired key must restart its baseline, not flag: $got")
    } finally q.stop()
  }
}
