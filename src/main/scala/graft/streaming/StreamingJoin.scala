package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-STREAM interval join — the online twin of
  * [[graft.operators.Temporal.intervalOverlapJoin]]'s bounded-horizon
  * special case, and the pairing operator [[StreamingEnrich]]'s
  * docstring contrasts itself against: where as-of enrichment keeps ONE
  * latest row per key, the interval join emits EVERY (click, view) pair
  * of the same user with the view inside a bounded horizon before the
  * click — attribution ("which impressions get credit for this click"),
  * not enrichment.
  *
  * Built on Spark's native watermarked stream-stream join: the
  * time-range predicate (`view_ts` in `[click_ts - horizon, click_ts]`)
  * plus a watermark on BOTH sides lets the engine derive a state
  * eviction bound per side — a buffered view can stop waiting once the
  * watermark passes `view_ts + horizon` (no future click can reach back
  * to it), a buffered click once the watermark passes `click_ts`. State
  * is therefore O(arrival rate × (horizon + watermark)) per side, keyed
  * and partitioned by `user_id` like any shuffle — bounded by TIME, not
  * stream length. Without the range predicate the same join would
  * buffer both streams forever; the predicate IS the scale design.
  *
  * Join types:
  *  - `inner`: pairs emit as soon as both sides have arrived (no
  *    watermark wait) — StreamingJoinSpec pins stream ≡ batch equality
  *    on the real events table.
  *  - `leftOuter`: a click with NO view in its horizon still emits once,
  *    with null view columns — but only after the watermark passes the
  *    click's eviction time (the engine must be SURE no match is still
  *    in flight; that certainty is exactly what the watermark encodes).
  *    The spec drives the watermark forward with a sentinel event to
  *    observe the null row — the same flush a production pipeline gets
  *    for free from continuing traffic.
  */
object StreamingJoin {

  /** One predicate for both the streaming and batch paths — sharing it
    * here means the spec's stream ≡ batch pin compares two executions of
    * the SAME join condition, not the condition and a copy. */
  private def pairCondition(horizon: String): Column =
    expr(s"""user_id = v_user AND
             view_ts >= click_ts - INTERVAL $horizon AND
             view_ts <= click_ts""")

  private def clickSide(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))

  private def viewSide(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))

  /** Pair each click with the same user's views within `horizon` before
    * it. `events` is an `events`-schema stream (one source, self-joined:
    * both branches filter the same stream — supported natively).
    * Output: (click_id, user_id, click_ts, view_id, view_ts) — view
    * columns null for unmatched clicks under `leftOuter`. */
  def viewClickIntervalJoin(events: DataFrame,
                            horizon: String = "1 hour",
                            watermark: String = "2 hours",
                            joinType: String = "inner"): DataFrame = {
    require(Set("inner", "leftOuter").contains(joinType),
      s"unsupported stream-stream join type $joinType")
    clickSide(events).withWatermark("click_ts", watermark)
      .join(viewSide(events).withWatermark("view_ts", watermark),
        pairCondition(horizon), joinType)
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("view_id"), col("view_ts"))
  }

  /** The batch twin the spec pins against: the same sides and the same
    * [[pairCondition]], executed as a plain batch join. */
  def viewClickIntervalJoinBatch(events: DataFrame,
                                 horizon: String = "1 hour"): DataFrame =
    clickSide(events)
      .join(viewSide(events), pairCondition(horizon), "inner")
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("view_id"), col("view_ts"))
}
