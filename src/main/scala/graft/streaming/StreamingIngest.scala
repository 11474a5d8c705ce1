package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.Sketches

/** Streaming incremental ingest: the online consumer of the STORED
  * seen-filter ([[graft.operators.Sketches.buildSeenFilter]]) — how a
  * crawl actually uses yesterday's summary. Each micro-batch probes the
  * filter with the same zero-join foldable-literal predicate the batch
  * path uses (the blob is a build-once artifact, NOT streaming state —
  * re-ingesting history never rescans it), then exact-dedups WITHIN the
  * stream on the content key via Spark's watermarked
  * `dropDuplicatesWithinWatermark` keyed state.
  *
  * State story: the bloom contributes ZERO state rows (it rides the
  * predicate); only the within-stream dedup keeps keys, and the
  * watermark bounds how long — the two mechanisms answer different
  * questions (seen BEFORE this stream started vs seen EARLIER IN this
  * stream) with the storage each deserves at 100 TB: kilobytes constant
  * for all of history, one state row per distinct in-flight key for the
  * watermark horizon.
  */
object StreamingIngest {

  /** Keep only documents whose content key is new against BOTH the
    * stored filter and the stream's own watermark horizon. Input must
    * carry (doc_id, text, ts) with a watermark already set when
    * `withinStreamDedup` is on. Output: (doc_id, k, ts) of accepted docs. */
  def acceptNew(docs: DataFrame, seen: Array[Byte],
                withinStreamDedup: Boolean = true): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    val keyed = docs.select(col("doc_id"), md5(col("text")).as("k"), col("ts"))
    val unseen = Sketches.filterUnseen(keyed, "k", seen)
    if (withinStreamDedup) unseen.dropDuplicatesWithinWatermark("k")
    else unseen
  }
}
