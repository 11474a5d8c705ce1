package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming time-series gap-fill + forward fill — the live twin of
  * [[graft.operators.Temporal.gapFillForwardFill]]: per key, one row per
  * hourly bucket, where an observed bucket carries its LAST observation
  * (by ts, event_id) and an empty bucket carries the previous value
  * forward (`filled = true`).
  *
  * Emission contract: a bucket is emitted the moment a LATER-bucket
  * event for the same key arrives — only then is its "last observation"
  * final. The still-open tail bucket of every key is therefore never
  * emitted mid-stream (StreamingGapFillSpec pins stream == batch minus
  * each key's final bucket). With `stateTtlMs` > 0 an idle key's state
  * expires WITHOUT flushing the open bucket: a flush-on-timeout would
  * emit a bucket that a late revival could still amend.
  *
  * In-order assumption (the [[StreamingEwma]] discipline): arrivals
  * apply in (ts, event_id) order within a micro-batch, so batch
  * boundaries never change bucket contents for streams that are in
  * order ACROSS batches. A row for an already-closed bucket (late,
  * cross-batch) is DROPPED — the batch operator would have included it,
  * so late data diverges; watermark-buffered reordering is the
  * latency-for-parity trade this operator deliberately does not make.
  *
  * State bounds: O(1) per key forever — the open bucket's (hour, value)
  * pair and nothing else; gap emission between distant buckets is
  * guarded by the same `maxBucketsPerKey` loud-failure cap as the batch
  * grid (a bad clock would otherwise fan one arrival into an unbounded
  * emission, the streaming mirror of the grid explosion).
  */
object StreamingGapFill {

  case class GapPoint(user_id: Long, w: java.sql.Timestamp, v: Double, filled: Boolean)

  /** Keyed state: the OPEN bucket — its hour index and the value that
    * wins it so far. (Public: the state encoder must reach it.) */
  case class OpenBucket(hour: Long, value: Double)

  /** Input: a streaming DataFrame with `user_id: long`, `event_id:
    * long`, `ts: timestamp`, `value: double`. */
  def gapFill(events: DataFrame, maxBucketsPerKey: Long = 8784L,
              stateTtlMs: Long = 0L): Dataset[GapPoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    val keyed = events.select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[(Long, Long, java.sql.Timestamp, Double)]
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenBucket, GapPoint](OutputMode.Append, timeout) {
        (key: Long, rows: Iterator[(Long, Long, java.sql.Timestamp, Double)],
         state: GroupState[OpenBucket]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var open = state.getOption
            var maxTs = Long.MinValue
            val out = Vector.newBuilder[GapPoint]
            // same rounding as the batch plan's round(v, 6)
            def r6(x: Double): Double =
              BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            def emit(hour: Long, value: Double, filled: Boolean): Unit =
              out += GapPoint(key,
                new java.sql.Timestamp(hour * 3600L * 1000L), r6(value), filled)
            rows.toVector.sortBy(r => (r._3.getTime, r._2)).foreach {
              case (_, _, ts, v) =>
                if (ts != null) {
                  if (ts.getTime > maxTs) maxTs = ts.getTime
                  val h = Math.floorDiv(ts.getTime, 3600L * 1000L)
                  open match {
                    case None => open = Some(OpenBucket(h, v))
                    case Some(OpenBucket(ch, _)) if h == ch =>
                      open = Some(OpenBucket(h, v)) // later obs wins the bucket
                    case Some(OpenBucket(ch, cv)) if h > ch =>
                      if (h - ch >= maxBucketsPerKey) throw new IllegalStateException(
                        s"StreamingGapFill: key $key jumps ${h - ch} hourly buckets, " +
                          s"over maxBucketsPerKey=$maxBucketsPerKey — coarsen the " +
                          "bucket or raise the cap")
                      emit(ch, cv, filled = false)
                      var g = ch + 1
                      while (g < h) { emit(g, cv, filled = true); g += 1 }
                      open = Some(OpenBucket(h, v))
                    case _ => // h < ch: late into a closed bucket — dropped (documented)
                  }
                }
            }
            open.foreach(state.update)
            if (stateTtlMs > 0)
              state.setTimeoutTimestamp(
                math.max(maxTs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}
