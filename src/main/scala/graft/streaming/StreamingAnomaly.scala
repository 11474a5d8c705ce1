package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling z-score anomaly detection — the live twin of
  * [[graft.operators.Temporal.rollingAnomalies]]: each event is scored
  * against the mean/stddev of the `lookback` events that preceded it on
  * its key, and flagged when |z| exceeds the threshold. The batch
  * operator computes that trailing frame with a window; here the frame
  * IS the keyed state — a ring of at most `lookback` doubles — so the
  * same event sequence produces the same flags (StreamingAnomalySpec
  * pins batch-twin equality).
  *
  * State bounds: per key a HARD ≤ `lookback` doubles, forever — scoring
  * is O(lookback) on arrival against a buffer that never grows with the
  * stream. Key count grows with the key universe unless `stateTtlMs` >
  * 0 (watermark-anchored sliding timeout, same discipline as
  * [[StreamingDistinct]]); TTL mode requires a watermarked `ts`.
  *
  * In-batch arrivals are applied in (ts, event_id) order per key, so a
  * batch boundary never changes which baseline a row saw — replaying
  * the same events through different micro-batch splits is
  * deterministic (the spec feeds one-batch and three-batch splits).
  */
object StreamingAnomaly {

  case class AnomalyFlag(user_id: Long, event_id: Long, z: Double)

  /** Keyed state: the trailing values, oldest first. (Public: the state
    * encoder's generated code must reach it.) */
  case class WindowState(values: Seq[Double])

  /** Input: a streaming DataFrame with `user_id: long`, `event_id:
    * long`, `ts: timestamp`, `value: double`. */
  def anomalies(events: DataFrame, lookback: Int = 20, zThresh: Double = 2.5,
                stateTtlMs: Long = 0L): Dataset[AnomalyFlag] = {
    require(lookback >= 2, s"anomalies: lookback must be >= 2, got $lookback")
    val spark = events.sparkSession
    import spark.implicits._
    val keyed = events.select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[(Long, Long, java.sql.Timestamp, Double)]
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState[WindowState, AnomalyFlag](
        OutputMode.Append, timeout) {
        (key: Long, rows: Iterator[(Long, Long, java.sql.Timestamp, Double)],
         state: GroupState[WindowState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var buf = state.getOption.map(_.values.toVector).getOrElse(Vector.empty)
            var maxTs = Long.MinValue
            val flags = Vector.newBuilder[AnomalyFlag]
            // deterministic application order inside the batch: event
            // time, then id — the same order the batch window uses
            rows.toVector.sortBy(r => (r._3.getTime, r._2)).foreach {
              case (_, eventId, ts, v) =>
                if (ts != null && ts.getTime > maxTs) maxTs = ts.getTime
                val n = buf.length
                if (n >= 2) {
                  val mu = buf.sum / n
                  val m2 = buf.foldLeft(0.0)((a, x) => a + (x - mu) * (x - mu))
                  val sigma = math.sqrt(m2 / (n - 1))
                  if (sigma > 0) {
                    val z = BigDecimal((v - mu) / sigma)
                      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
                    if (math.abs(z) > zThresh) flags += AnomalyFlag(key, eventId, z)
                  }
                }
                buf = (buf :+ v).takeRight(lookback)
            }
            state.update(WindowState(buf))
            if (stateTtlMs > 0)
              state.setTimeoutTimestamp(
                math.max(maxTs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            flags.result().iterator
          }
      }
  }
}
