package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingEwma

class StreamingEwmaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  private val series: Seq[(Long, Long, Timestamp, Double)] = Seq(
    (1L, 1L, ts(0), 10.0), (1L, 2L, ts(1), 12.0), (1L, 3L, ts(2), 9.5),
    (1L, 4L, ts(3), 11.0), (1L, 5L, ts(4), 10.25), (1L, 6L, ts(5), 40.0),
    (1L, 7L, ts(6), 10.0), (1L, 8L, ts(7), 10.5), (1L, 9L, ts(8), 9.75),
    (1L, 10L, ts(9), 11.25), (1L, 11L, ts(10), 10.0), (1L, 12L, ts(11), 10.125),
    (2L, 20L, ts(0), 5.0), (2L, 21L, ts(1), 6.0), (2L, 22L, ts(2), 5.5))

  private def runStream(batches: Seq[Seq[(Long, Long, Timestamp, Double)]],
                        name: String): Set[(Long, Long, Double, Double)] = {
    val stream = MemoryStream[(Long, Long, Timestamp, Double)](spark)
    val q = StreamingEwma.ewma(
        stream.toDF().toDF("user_id", "event_id", "ts", "value"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    } finally q.stop()
  }

  test("streaming ewma == batch ewmaSmooth on the same rows; batch-split invariance") {
    val oneBatch = runStream(Seq(series), "se_one")
    val threeBatches = runStream(
      Seq(series.take(5), series.slice(5, 9), series.drop(9)), "se_three")
    assert(oneBatch == threeBatches,
      s"micro-batch boundaries changed the smoothing: " +
        s"${(oneBatch diff threeBatches).take(3)} vs ${(threeBatches diff oneBatch).take(3)}")
    val batch = graft.operators.Temporal.ewmaSmooth(
        series.toDF("user_id", "event_id", "ts", "value"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2), r.getDouble(3))).toSet
    assert(oneBatch == batch,
      s"stream/batch divergence: stream-only=${(oneBatch diff batch).take(3)} " +
        s"batch-only=${(batch diff oneBatch).take(3)}")
    // sanity on the semantics themselves: the first point is its own ewma
    // (single-lag renormalization), and smoothing damps the planted spike
    val byId = oneBatch.map(t => t._2 -> t._4).toMap
    assert(byId(1L) == 10.0, s"head renormalization: ${byId(1L)}")
    assert(byId(6L) < 40.0 && byId(6L) > 15.0, s"spike must be damped: ${byId(6L)}")
  }

  test("state is a bounded FIR frame: values older than taps-1 cannot influence the output") {
    // taps=3: event 4's ewma must ignore value 1000 once two newer values exist
    val rows = Seq(
      (1L, 1L, ts(0), 1000.0), (1L, 2L, ts(1), 10.0),
      (1L, 3L, ts(2), 10.0), (1L, 4L, ts(3), 10.0))
    val stream = MemoryStream[(Long, Long, Timestamp, Double)](spark)
    val q = StreamingEwma.ewma(
        stream.toDF().toDF("user_id", "event_id", "ts", "value"), alpha = 0.3, taps = 3)
      .writeStream.format("memory").queryName("se_frame").outputMode("append").start()
    val got = try {
      stream.addData(rows: _*); q.processAllAvailable()
      spark.table("se_frame").collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    } finally q.stop()
    assert(got(4L) == 10.0, s"spike outside the 3-tap frame leaked in: ${got(4L)}")
    assert(got(3L) > 10.0, s"spike inside the frame must still weigh: ${got(3L)}")
  }

  test("event-time TTL expires idle keys: a returning key restarts its frame") {
    val stream = MemoryStream[(Long, Long, Timestamp, Double)](spark)
    val q = StreamingEwma.ewma(
        stream.toDF().toDF("user_id", "event_id", "ts", "value")
          .withWatermark("ts", "0 seconds"),
        stateTtlMs = 60000L)
      .writeStream.format("memory").queryName("se_ttl").outputMode("append").start()
    try {
      stream.addData((1L, 1L, ts(0), 100.0), (2L, 90L, ts(0), 1.0))
      q.processAllAvailable()
      stream.addData((2L, 91L, ts(10), 1.0)) // advance watermark 10 min
      q.processAllAvailable()
      // key 1 returns: expired state → its ewma is the raw value, not a
      // blend with the stale 100.0
      stream.addData((1L, 2L, ts(11), 10.0))
      q.processAllAvailable()
      val got = spark.table("se_ttl").collect()
        .map(r => r.getLong(1) -> r.getDouble(3)).toMap
      assert(got(2L) == 10.0, s"stale frame survived TTL: ${got(2L)}")
    } finally q.stop()
  }
}
