package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-funnel progress — sequence detection in keyed
  * state (the CEP-lite twin of [[graft.operators.Temporal.funnel]]).
  *
  * State per user is the vector of step ENTRY TIMES reached so far —
  * a hard ≤ `steps.size` longs, forever, regardless of how many events
  * the user emits (the per-key bound that makes this survivable on an
  * open user domain; key-count growth is handled by the same optional
  * watermark-anchored TTL as [[StreamingDistinct]]).
  *
  * Semantics: within each batch, a user's arrivals are processed in
  * event-time order; an event of step k enters the funnel when the
  * previous step was entered strictly earlier (`ts > entry(k-1)`), and
  * an earlier-than-recorded arrival for an already-entered step
  * REFINES that entry time downward when it still satisfies its
  * predecessor — a safe monotone refinement: lowering `entry(k)` can
  * only loosen the constraint later steps already satisfied. The
  * result equals the batch chained-min funnel whenever events are
  * processed in global event-time order (one batch, or batches split
  * on time — the replayed-log case, pinned by spec); under arbitrary
  * cross-batch lateness an event REJECTED before a refinement that
  * would now admit it is not replayed — the standard
  * bounded-state/exactness tradeoff, stated rather than hidden.
  */
object StreamingFunnel {

  case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)
  /** Emitted whenever a user's progress changes: the furthest step
    * reached (1-based), its entry time, and the per-user change
    * counter (latest row per user = current progress). */
  case class FunnelProgress(user_id: Long, reached: Int, entry_ts: Timestamp,
                            seq: Long)
  /** Keyed state: entry epoch-millis per reached step + the emission
    * counter. (Public: the state encoder's codegen must reach it.) */
  case class FunnelState(entries: Seq[Long], seq: Long)

  /** Input: a streaming DataFrame with `user_id: long`,
    * `ts: timestamp`, `event_type: string` (watermark on `ts` required
    * when `stateTtlMs` > 0). */
  def progress(events: DataFrame,
               steps: Seq[String] = Seq("view", "click", "purchase"),
               stateTtlMs: Long = 0L): Dataset[FunnelProgress] = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val keyed = events.select(col("user_id"), col("ts"), col("event_type"))
      .as[FunnelEvent]
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    keyed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Update, timeout) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption
            var entries = prev.map(_.entries.toVector).getOrElse(Vector.empty[Long])
            val before = entries
            // per-user per-batch arrivals: bounded, sorted in memory
            val evs = rows.toArray.sortBy(_.ts.getTime)
            var maxTs = Long.MinValue
            evs.foreach { e =>
              val t = e.ts.getTime
              if (t > maxTs) maxTs = t
              stepIdx.get(e.event_type).foreach { k =>
                val afterPrev = k == 0 || (entries.size >= k && t > entries(k - 1))
                if (k == entries.size && afterPrev)
                  entries = entries :+ t
                else if (k < entries.size && t < entries(k) && afterPrev)
                  entries = entries.updated(k, t) // monotone refinement
              }
            }
            val changed = entries != before
            if (changed || (stateTtlMs > 0 && (prev.nonEmpty || changed))) {
              val seq = prev.map(_.seq).getOrElse(0L) + (if (changed) 1 else 0)
              if (changed) state.update(FunnelState(entries, seq))
              if (stateTtlMs > 0 && (changed || prev.nonEmpty))
                state.setTimeoutTimestamp(
                  math.max(maxTs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            }
            if (changed)
              Iterator.single(FunnelProgress(uid, entries.size,
                new Timestamp(entries.last), prev.map(_.seq).getOrElse(0L) + 1))
            else Iterator.empty
          }
      }
  }
}
