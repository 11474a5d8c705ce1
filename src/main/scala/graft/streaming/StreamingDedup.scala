package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.GraftFunctions

/** Streaming near-duplicate detection: the online twin of
  * [[graft.operators.Dedup.minhashPairs]].
  *
  * Incoming documents are minhash-signed at the scan (native
  * `minhash_signature`), banded, and routed to per-(band, bucket) keyed
  * state holding the signatures seen in that bucket. A new document is
  * compared against its bucket's residents — estimated Jaccard = the
  * fraction of matching signature elements — and emits a hit when it
  * crosses the threshold.
  *
  * State bounds — two independent dimensions:
  *  - per-bucket DEPTH is bounded by `maxPerBucket` (FIFO eviction);
  *  - the NUMBER of bucket keys grows with distinct content (~`k/r` new
  *    keys per novel document) and is unbounded over an infinite stream
  *    unless `stateTtlMs` > 0: then each bucket carries an event-time
  *    timeout of watermark + TTL, refreshed on activity, and idle buckets
  *    are dropped when the watermark passes it. TTL mode requires the
  *    input to carry a `ts` timestamp column with a watermark already set
  *    (`docs.withWatermark("ts", ...)`). With `stateTtlMs` = 0 (batch
  *    runs, short-lived streams) no timeout is registered — total state
  *    then grows linearly with the number of distinct buckets seen.
  *    (Event-time rather than ProcessingTimeTimeout: the latter schedules
  *    continuous empty micro-batches, which starves
  *    `processAllAvailable`-style test harnesses and burns cluster cycles
  *    on an idle stream.)
  *
  * A true pair collides in several buckets and so may emit more than
  * once; consumers that need exactly-one-hit semantics de-duplicate on
  * (doc_id, dup_of) downstream.
  */
object StreamingDedup {

  case class DocEvent(doc_id: Long, text: String)
  /** TTL-mode input shape: documents with an event-time column. */
  case class DocEventTs(doc_id: Long, text: String, ts: java.sql.Timestamp)
  case class DupHit(doc_id: Long, dup_of: Long, est_j: Double)

  /** Bucket-state entry (public: the state encoder's generated code must
    * reach the constructor). */
  case class Resident(id: Long, sig: Seq[Long])

  def nearDupHits(docs: DataFrame, minJ: Double, n: Int = 3, k: Int = 64,
                  r: Int = 4, maxPerBucket: Int = 64,
                  stateTtlMs: Long = 0L): Dataset[DupHit] = {
    val spark = docs.sparkSession
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val nBands = k / r
    require(stateTtlMs <= 0 || docs.columns.contains("ts"),
      "stateTtlMs > 0 needs a 'ts' event-time column with a watermark " +
        "(docs.withWatermark(\"ts\", ...))")
    // The event-time column rides along UNMODIFIED in TTL mode: the
    // timeout anchors on the data's own clock (watermark alone is 0 in
    // the first batch, which would give the stream's opening state a
    // degenerate near-zero expiry), and the watermark tag lives on the
    // attribute itself — wrapping it in an expression (unix_millis) would
    // strip the tag and fail the event-time-timeout analysis check.
    val tsCol = if (stateTtlMs > 0) col("ts") else lit(null).cast("timestamp")
    val banded = docs
      .withColumn("sig", expr(s"minhash_signature(text, $n, $k)"))
      .select(col("doc_id"), col("sig"), tsCol.as("ts"),
        posexplode(expr(s"transform(sequence(0, ${nBands - 1}), " +
          s"j -> xxhash64(slice(sig, j * $r + 1, $r)))"))
          .as(Seq("band_idx", "bucket")))
      .select(col("doc_id"), col("sig"),
        concat_ws(":", col("band_idx"), col("bucket")).as("bkey"), col("ts"))
      .as[(Long, Seq[Long], String, java.sql.Timestamp)]

    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    banded
      .groupByKey(_._3)
      .flatMapGroupsWithState[List[Resident], DupHit](
        OutputMode.Update, timeout) {
        (_: String, rows: Iterator[(Long, Seq[Long], String, java.sql.Timestamp)],
         state: GroupState[List[Resident]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var residents = state.getOption.getOrElse(Nil)
            var maxTs = Long.MinValue
            val hits = scala.collection.mutable.ListBuffer[DupHit]()
            rows.foreach { case (id, sig, _, ts) =>
              if (ts != null && ts.getTime > maxTs) maxTs = ts.getTime
              residents.foreach { res =>
                var same = 0
                var i = 0
                while (i < sig.length) { if (sig(i) == res.sig(i)) same += 1; i += 1 }
                val est = same.toDouble / sig.length
                if (est >= minJ && res.id != id) hits += DupHit(id, res.id, est)
              }
              residents = (Resident(id, sig) :: residents).take(maxPerBucket)
            }
            state.update(residents)
            // sliding TTL: activity pushes the expiry out to event-time +
            // TTL (clamped above the watermark — Spark rejects timeouts
            // at or behind it)
            if (stateTtlMs > 0)
              state.setTimeoutTimestamp(
                math.max(maxTs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            hits.iterator
          }
      }
  }
}
