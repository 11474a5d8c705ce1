package graft.streaming

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming approximate quantiles: KLL-sketch-in-state — the streaming
  * twin of [[graft.operators.Sketches]]' persisted KLL summaries, and
  * the last leg of the sketch family to get one ([[StreamingDistinct]]
  * covers distinct via theta, [[StreamingHeavyHitters]] frequency via
  * Misra-Gries).
  *
  * A streaming `percentile(value, …)` is unsupported for the same
  * reason streaming distinct is: an exact quantile needs every value
  * ever seen, so the naive state is the whole history per key. Here
  * state is one KLL blob per key: O(1) absorb per arrival, ~3 KB at the
  * default k=200 forever, EXACT until the sketch first compacts and
  * carrying the published ±1.65%-of-rank (99% confidence) bound after —
  * the live "p99 latency per endpoint" dashboard feed.
  *
  * State bounds — the same two dimensions as [[StreamingDistinct]]:
  *  - per-key state is a HARD ≤ sketch-capacity blob, forever;
  *  - the key population grows with the stream unless `stateTtlMs` > 0:
  *    then each key carries a sliding event-time timeout
  *    (watermark-anchored, activity-refreshed) and idle keys drop —
  *    TTL mode needs a `ts` column with a watermark set.
  */
object StreamingQuantiles {

  case class KeyedValue(key: String, value: Double)
  /** TTL-mode input shape: values with an event-time column. */
  case class KeyedValueTs(key: String, value: Double, ts: java.sql.Timestamp)

  /** The latest row per key is the current estimate; `n` is the exact
    * count absorbed so far (KLL tracks it losslessly), `seq` the per-key
    * batch counter. Quantiles use INCLUSIVE search criteria — identical
    * to the batch `kll_quantile` expression, so a stream that stays
    * below compaction capacity matches the batch answer EXACTLY. */
  case class QuantileEstimate(key: String, p50: Double, p95: Double,
                              p99: Double, n: Long, seq: Long)

  /** Keyed state: the serialized KLL sketch + the emission counter.
    * (Public: the state encoder's generated code must reach it.) */
  case class KllState(bytes: Array[Byte], seq: Long)

  private def quantileOrNaN(sk: KllDoublesSketch, rank: Double): Double =
    if (sk.isEmpty) Double.NaN
    else sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)

  /** Input: a streaming DataFrame with `key: string`, `value: double`
    * (+ `ts: timestamp` under a watermark when `stateTtlMs` > 0). */
  def quantilesPerKey(events: DataFrame, k: Int = 200,
                      stateTtlMs: Long = 0L): Dataset[QuantileEstimate] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(stateTtlMs <= 0 || events.columns.contains("ts"),
      "stateTtlMs > 0 needs a 'ts' event-time column with a watermark " +
        "(events.withWatermark(\"ts\", ...))")
    // keep the watermark-tagged attribute itself in TTL mode (wrapping
    // it in an expression would strip the event-time tag; see
    // StreamingDedup for the full rationale)
    val tsCol = if (stateTtlMs > 0) col("ts") else lit(null).cast("timestamp")
    val keyed = events.select(col("key"), col("value"), tsCol.as("ts"))
      .as[(String, Double, java.sql.Timestamp)]

    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState[KllState, QuantileEstimate](
        OutputMode.Update, timeout) {
        (key: String, rows: Iterator[(String, Double, java.sql.Timestamp)],
         state: GroupState[KllState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sk = state.getOption
              .map(s => KllDoublesSketch.heapify(Memory.wrap(s.bytes)))
              .getOrElse(KllDoublesSketch.newHeapInstance(k))
            var maxTs = Long.MinValue
            rows.foreach { case (_, v, ts) =>
              if (ts != null && ts.getTime > maxTs) maxTs = ts.getTime
              sk.update(v)
            }
            val seq = state.getOption.map(_.seq).getOrElse(0L) + 1
            state.update(KllState(sk.toByteArray, seq))
            if (stateTtlMs > 0)
              state.setTimeoutTimestamp(
                math.max(maxTs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            Iterator.single(QuantileEstimate(key,
              quantileOrNaN(sk, 0.5), quantileOrNaN(sk, 0.95),
              quantileOrNaN(sk, 0.99), sk.getN, seq))
          }
      }
  }
}
