package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming population-stability drift — the live twin of
  * [[graft.operators.Constraints.driftReport]]: each event-time window
  * of the serving stream is binned into the SAME fixed-width histogram
  * as a reference (training) snapshot, and the window's PSI against the
  * reference emits when the watermark closes it. This is the
  * train-vs-serve gate run continuously: the batch report answers "did
  * yesterday drift?", this answers "is the last hour drifting?" while
  * the stream runs.
  *
  * Scale shape: the reference histogram is bins-sized and rides into
  * the plan as a LITERAL array (the stored-summary pattern — the
  * 100 TB training corpus is never joined, it was reduced to `nBins`
  * longs once). The stream side is ONE watermarked windowed aggregate
  * whose state per window is `nBins` conditional counters; the PSI
  * arithmetic is per-row expression math on the closed window's
  * histogram. Nothing beyond (window × bins) ever exists.
  *
  * Determinism: identical add-one smoothing, identical double-division
  * and `((p−q)·ln(p/q))·1e9` term order, identical round-to-long
  * contribution discipline as the batch operator — StreamingDriftSpec
  * pins per-window equality with [[graft.operators.Constraints.driftReport]]
  * run on (reference ∪ window rows), not merely approximate agreement.
  */
object StreamingDrift {

  /** Reduce a reference snapshot to its bin-count array — the one
    * driver pull, bins-sized by construction (the sketch-blob
    * discipline: this IS the stored summary a serving fleet ships). */
  def referenceHistogram(ref: DataFrame, valueCol: String,
                         binWidth: Double, maxBin: Int): Array[Long] = {
    val counts = ref
      .select(least(floor(col(valueCol) / binWidth), lit(maxBin)).cast("long").as("bin"))
      .groupBy("bin").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Array.tabulate(maxBin + 1)(b => counts.getOrElse(b.toLong, 0L))
  }

  /** Per-window PSI of a streaming `valueCol` against `refHist`.
    * Append mode: one row per (window) once the watermark passes its
    * end — `w` (window start), `n_cur` (window row count), `psi`.
    * Applied to a batch DataFrame the same code degrades to a plain
    * windowed aggregate (withWatermark is a no-op). */
  def psiPerWindow(events: DataFrame, refHist: Array[Long],
                   binWidth: Double, maxBin: Int,
                   valueCol: String = "value", tsCol: String = "ts",
                   windowDur: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame = {
    val nBins = maxBin + 1
    require(refHist.length == nBins, s"refHist has ${refHist.length} bins, want $nBins")
    val totRefPlus = refHist.sum + nBins // denominator constant, embeds as a literal
    val binCounts = (0 to maxBin).map(b =>
      sum(when(col("_bin") === b, 1L).otherwise(0L)).as(s"_b$b"))
    val refLit: Column = typedlit(refHist.toSeq)
    events
      .withColumn("_bin", least(floor(col(valueCol) / binWidth), lit(maxBin)).cast("long"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(binCounts.head, binCounts.tail: _*)
      .withColumn("cur", array((0 to maxBin).map(b => col(s"_b$b")): _*))
      .withColumn("n_cur", expr("aggregate(cur, 0L, (a, x) -> a + x)"))
      .withColumn("_ref", refLit)
      // identical term order to the batch operator: ((p - q) * ln(p / q)) * 1e9,
      // rounded to a long per bin, summed as longs (order-free). A bin
      // empty on BOTH sides contributes 0 — the batch groupBy never
      // materializes such a bin, so including its smoothed (p≠q) term
      // here would silently diverge from the twin
      .withColumn("_psi_s", expr(
        s"""aggregate(
              zip_with(_ref, cur, (r, c) ->
                CASE WHEN r = 0 AND c = 0 THEN 0L ELSE
                CAST(round(((CAST(r + 1 AS DOUBLE) / $totRefPlus) -
                            (CAST(c + 1 AS DOUBLE) / (n_cur + $nBins))) *
                           ln((CAST(r + 1 AS DOUBLE) / $totRefPlus) /
                              (CAST(c + 1 AS DOUBLE) / (n_cur + $nBins))) * 1e9)
                     AS BIGINT) END),
              0L, (a, x) -> a + x)"""))
      .select(col("window.start").as("w"), col("n_cur"),
        round(col("_psi_s") / 1e9, 6).as("psi"))
  }
}
