package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment: the online twin of
  * [[graft.operators.Temporal.asofJoin]] — each click is enriched with
  * the user's LATEST view at-or-before it, as events arrive.
  *
  * Unlike the stream-stream interval join (bounded horizon, pairs), the
  * as-of contract needs only the single most recent right row per key,
  * so state is ONE tiny row per user — bounded by key cardinality, not
  * stream length or time, with no watermark needed for state size (add
  * one for late-data semantics if sources can regress in event time).
  *
  * Ordering contract: rows are processed in (ts, view-before-click,
  * event_id) order WITHIN each micro-batch — the same tie rules as the
  * batch [[graft.operators.Temporal.asofJoin]] (a simultaneous view is
  * visible to the click; among simultaneous views the highest id wins,
  * matching the batch side's max-per-(user, ts) dedup). When events
  * arrive in event-time order across batches (the common
  * log-shipping case), the streaming output equals the batch as-of join
  * exactly — StreamingEnrichSpec pins that equivalence. A view arriving
  * in a LATER batch than a click it precedes cannot retroactively
  * re-enrich it (the click was already emitted): classic
  * enrichment-vs-reprocessing tradeoff, resolved by replaying through
  * the batch path.
  */
object StreamingEnrich {

  case class EnrichEvent(event_id: Long, user_id: Long, event_type: String,
                         ts: java.sql.Timestamp)
  case class Enriched(click_id: Long, user_id: Long, view_id: Option[Long])
  case class LastView(view_id: Long, tsMillis: Long)

  def asofEnrich(events: DataFrame): Dataset[Enriched] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("event_id", "user_id", "event_type", "ts").as[EnrichEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastView, Enriched](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EnrichEvent], state: GroupState[LastView]) =>
          var last = state.getOption.orNull
          // batch-local event-time order with the batch as-of tie rules:
          // views sort before clicks at the same instant, later view ids
          // supersede earlier ones
          val ordered = rows.toSeq.sortBy(e =>
            (e.ts.getTime, if (e.event_type == "view") 0 else 1, e.event_id))
          val out = scala.collection.mutable.ListBuffer[Enriched]()
          ordered.foreach { e =>
            e.event_type match {
              case "view" =>
                // strict tie rule ACROSS batches too: at equal ts the
                // higher view id wins (matching the batch side's
                // max-per-(user, ts) dedup) — a plain >= would let a
                // lower-id view from a later batch overwrite it
                if (last == null || e.ts.getTime > last.tsMillis ||
                    (e.ts.getTime == last.tsMillis && e.event_id > last.view_id))
                  last = LastView(e.event_id, e.ts.getTime)
              case "click" =>
                out += Enriched(e.event_id, uid,
                  if (last == null) None else Some(last.view_id))
              case _ => // other event types pass through untouched
            }
          }
          if (last != null) state.update(last)
          out.iterator
      }
  }
}
