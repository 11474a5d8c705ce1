package graft.streaming

import org.apache.datasketches.theta.SetOperation

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.ThetaUtil

/** Streaming approximate distinct counting: sketch-in-state — the
  * streaming twin of [[graft.operators.Sketches]]' persisted summaries.
  *
  * A streaming `groupBy(key).agg(countDistinct(value))` is unsupported
  * (distinct aggregation needs the full value set), and emulating it
  * with `dropDuplicates` + count keeps ONE STATE ROW PER DISTINCT VALUE
  * per key — unbounded on an open domain (user ids, URLs). Here state is
  * one theta-sketch blob per key: a k-min-hash sample that absorbs every
  * arrival in O(1), never exceeds ~2^lgK entries (kilobytes), is EXACT
  * below that capacity, and carries a published error bound above it.
  * Each batch folds its arrivals into the blob and emits the running
  * estimate (update mode) — the live "distinct users per hour"
  * dashboard feed.
  *
  * State bounds — the same two dimensions as [[StreamingDedup]]:
  *  - per-key state is a HARD ≤ sketch-capacity blob, forever;
  *  - the number of keys (e.g. hours) grows with the stream unless
  *    `stateTtlMs` > 0: then each key carries a sliding event-time
  *    timeout (watermark-anchored, activity-refreshed) and idle keys
  *    are dropped — TTL mode needs a `ts` column with a watermark set.
  */
object StreamingDistinct {

  case class KeyedEvent(key: String, value: Long)
  /** TTL-mode input shape: events with an event-time column. */
  case class KeyedEventTs(key: String, value: Long, ts: java.sql.Timestamp)
  /** `approx_distinct` is exact while the key has seen ≤ 2^lgK distinct
    * values (θ = 1); `seq` is the per-key batch counter — the latest row
    * per key is the current estimate. */
  case class DistinctEstimate(key: String, approx_distinct: Double, seq: Long)

  /** Keyed state: the compact theta sketch + the emission counter.
    * (Public: the state encoder's generated code must reach it.) */
  case class SketchState(bytes: Array[Byte], seq: Long)

  /** Input: a streaming DataFrame with `key: string`, `value: long`
    * (+ `ts: timestamp` under a watermark when `stateTtlMs` > 0). */
  def distinctPerKey(events: DataFrame, lgK: Int = 12,
                     stateTtlMs: Long = 0L): Dataset[DistinctEstimate] = {
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
      .as[(String, Long, java.sql.Timestamp)]

    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState[SketchState, DistinctEstimate](
        OutputMode.Update, timeout) {
        (key: String, rows: Iterator[(String, Long, java.sql.Timestamp)],
         state: GroupState[SketchState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val union = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
            val prev = state.getOption
            prev.foreach(s => union.union(ThetaUtil.wrap(s.bytes)))
            var maxTs = Long.MinValue
            rows.foreach { case (_, v, ts) =>
              if (ts != null && ts.getTime > maxTs) maxTs = ts.getTime
              union.update(v)
            }
            val compact = union.getResult
            val seq = prev.map(_.seq).getOrElse(0L) + 1
            state.update(SketchState(compact.toByteArray, seq))
            if (stateTtlMs > 0)
              state.setTimeoutTimestamp(
                math.max(maxTs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            Iterator.single(DistinctEstimate(key, compact.getEstimate, seq))
          }
      }
  }
}
