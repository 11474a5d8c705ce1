package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exponentially-weighted moving average — the live twin of
  * [[graft.operators.Temporal.ewmaSmooth]]: each event's smoothed value
  * is the `taps`-term FIR truncation ewma = Σ_j w_j·x_j / Σ_j w_j with
  * w_j = (1−α)^j over the lags that exist (series heads renormalize
  * over the shorter window — `adjust=true`).
  *
  * Bit-equality with the batch operator is engineered, not hoped for:
  * the weights come from the SAME `%.17g` decimal literals the batch
  * plan (and its DuckDB oracle) embed — parsed back to the identical
  * double — the numerator/denominator sums run in the same fixed
  * j-ascending order with 0.0 for absent lags, and the quotient is
  * rounded HALF_UP to 6 decimals exactly like Spark's `round`.
  * StreamingEwmaSpec pins stream == batch on the same rows.
  *
  * State bounds: per key a HARD ≤ `taps−1` doubles, forever — the FIR
  * frame IS the state, O(taps) work per arrival. Key count grows with
  * the key universe unless `stateTtlMs` > 0 (watermark-anchored
  * timeout, the [[StreamingAnomaly]] discipline; needs a watermarked
  * `ts`). In-batch arrivals apply in (ts, event_id) order per key, so
  * micro-batch boundaries never change which lags a row saw — FOR
  * STREAMS THAT ARE IN ORDER ACROSS BATCHES. The sort is per
  * micro-batch only: a late row arriving in a LATER batch is smoothed
  * against the newer values already in the lag buffer and diverges
  * from the batch operator, which sees the globally sorted series.
  * True out-of-order parity would need watermark-buffered reordering
  * (hold rows until the watermark passes, emit in ts order) — a
  * latency-for-parity trade this operator deliberately does not make.
  */
object StreamingEwma {

  case class EwmaPoint(user_id: Long, event_id: Long, value: Double, ewma: Double)

  /** Keyed state: the trailing raw values, oldest first, ≤ taps−1.
    * (Public: the state encoder's generated code must reach it.) */
  case class LagState(values: Seq[Double])

  /** Input: a streaming DataFrame with `user_id: long`, `event_id:
    * long`, `ts: timestamp`, `value: double`. */
  def ewma(events: DataFrame, alpha: Double = 0.3, taps: Int = 8,
           stateTtlMs: Long = 0L): Dataset[EwmaPoint] = {
    require(alpha > 0 && alpha < 1, s"ewma: alpha in (0,1), got $alpha")
    require(taps >= 1, s"ewma: taps must be >= 1, got $taps")
    val spark = events.sparkSession
    import spark.implicits._
    // identical doubles to the batch plan: round-trip through the same
    // decimal literals Temporal.ewmaWeights embeds in both engines' SQL
    val weights: Array[Double] = graft.operators.Temporal.ewmaWeights(alpha, taps)
      .map(s => s.stripPrefix("CAST(").stripSuffix(" AS DOUBLE)").toDouble)
      .toArray
    val keyed = events.select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[(Long, Long, java.sql.Timestamp, Double)]
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState[LagState, EwmaPoint](OutputMode.Append, timeout) {
        (key: Long, rows: Iterator[(Long, Long, java.sql.Timestamp, Double)],
         state: GroupState[LagState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var buf = state.getOption.map(_.values.toVector).getOrElse(Vector.empty)
            var maxTs = Long.MinValue
            val out = Vector.newBuilder[EwmaPoint]
            rows.toVector.sortBy(r => (r._3.getTime, r._2)).foreach {
              case (_, eventId, ts, v) =>
                if (ts != null && ts.getTime > maxTs) maxTs = ts.getTime
                // lag j: j=0 is the current value, j>=1 reads buf from the
                // newest end; absent lags contribute 0.0 to BOTH sums, in
                // the same j-ascending fold order as the batch expression
                var num = 0.0; var den = 0.0
                var j = 0
                while (j < taps) {
                  val x: java.lang.Double =
                    if (j == 0) v
                    else if (j <= buf.length) buf(buf.length - j)
                    else null
                  num += (if (x ne null) weights(j) * x.doubleValue else 0.0)
                  den += (if (x ne null) weights(j) else 0.0)
                  j += 1
                }
                val smoothed = BigDecimal(num / den)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                out += EwmaPoint(key, eventId, v, smoothed)
                buf = (buf :+ v).takeRight(taps - 1)
            }
            state.update(LagState(buf))
            if (stateTtlMs > 0)
              state.setTimeoutTimestamp(
                math.max(maxTs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}
