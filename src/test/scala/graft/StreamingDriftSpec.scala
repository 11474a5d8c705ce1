package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDrift
import graft.operators.Constraints

class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  // reference snapshot: 5 values per decade bin 0..9 (uniform)
  private val refVals: Seq[Double] = (0 until 50).map(i => (i % 10) * 10.0 + 3.0)
  // window 10:00: near-reference mix; window 11:00: mass piled on bin 0 (drifted)
  private val stable: Seq[(Timestamp, Double)] =
    (0 until 30).map(i => (ts(10, i), (i % 10) * 10.0 + 7.0))
  private val drifted: Seq[(Timestamp, Double)] =
    (0 until 30).map(i => (ts(11, i), (i % 3) * 10.0 + 2.0))

  private val binWidth = 10.0
  private val maxBin = 9

  private def refHist = StreamingDrift.referenceHistogram(
    refVals.toDF("value"), "value", binWidth, maxBin)

  /** Ground truth for one window: the batch operator on (ref ∪ window). */
  private def batchPsi(windowRows: Seq[(Timestamp, Double)]): Double = {
    val union = refVals.map(v => (v, false)) ++ windowRows.map { case (_, v) => (v, true) }
    Constraints.driftReport(union.toDF("value", "cur"), "value", col("cur"),
      binWidth, maxBin).select("psi_total").head().getDouble(0)
  }

  test("streaming per-window PSI == batch driftReport on (reference ∪ window); drift ranks") {
    val stream = MemoryStream[(Timestamp, Double)](spark)
    val q = StreamingDrift.psiPerWindow(
        stream.toDF().toDF("ts", "value"), refHist, binWidth, maxBin)
      .writeStream.format("memory").queryName("sd_psi").outputMode("append").start()
    val got = try {
      // two batches split MID-window: state must accumulate across them
      stream.addData(stable.take(17): _*); q.processAllAvailable()
      stream.addData(stable.drop(17) ++ drifted: _*); q.processAllAvailable()
      stream.addData((ts(20), 50.0)); q.processAllAvailable() // advance watermark
      spark.table("sd_psi").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toList
    } finally q.stop()
    val byW = got.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byW.keySet == Set(ts(10), ts(11)), s"emitted windows: ${byW.keySet}")
    assert(byW(ts(10))._1 == 30L && byW(ts(11))._1 == 30L, s"window counts: $byW")
    assert(byW(ts(10))._2 == batchPsi(stable),
      s"stable-window PSI ${byW(ts(10))._2} != batch ${batchPsi(stable)}")
    assert(byW(ts(11))._2 == batchPsi(drifted),
      s"drifted-window PSI ${byW(ts(11))._2} != batch ${batchPsi(drifted)}")
    // and the semantics: the shifted window is loudly less stable
    assert(byW(ts(11))._2 > 0.25 && byW(ts(10))._2 < 0.1,
      s"PSI ordering wrong: $byW")
  }

  test("a bin empty on BOTH sides contributes nothing (the batch groupBy's omission, mirrored)") {
    // ref and window both live in bins {0, 9} only: bins 1..8 are
    // doubly-empty and must not add smoothed noise to the total
    val ref2 = Seq.fill(20)(5.0) ++ Seq.fill(20)(95.0)
    val win = (0 until 20).map(i => (ts(10, i), if (i % 2 == 0) 5.0 else 95.0))
    val h = StreamingDrift.referenceHistogram(ref2.toDF("value"), "value", binWidth, maxBin)
    val stream = MemoryStream[(Timestamp, Double)](spark)
    val q = StreamingDrift.psiPerWindow(
        stream.toDF().toDF("ts", "value"), h, binWidth, maxBin)
      .writeStream.format("memory").queryName("sd_empty").outputMode("append").start()
    val got = try {
      stream.addData(win: _*); stream.addData((ts(20), 50.0))
      q.processAllAvailable()
      spark.table("sd_empty").collect()
        .map(r => r.getTimestamp(0) -> r.getDouble(2)).toMap
    } finally q.stop()
    val union = ref2.map(v => (v, false)) ++ win.map { case (_, v) => (v, true) }
    val want = Constraints.driftReport(union.toDF("value", "cur"), "value", col("cur"),
      binWidth, maxBin).select("psi_total").head().getDouble(0)
    assert(got(ts(10)) == want, s"streaming ${got(ts(10))} != batch $want")
  }
}
