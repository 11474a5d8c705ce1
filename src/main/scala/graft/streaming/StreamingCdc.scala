package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC apply: a change stream (upserts + deletes) continuously
  * maintained into a partitioned parquet table — [[graft.operators.Merge]]
  * run per micro-batch via `foreachBatch`, the Structured-Streaming shape
  * for "the output is a TABLE someone else reads", where a plain sink
  * (append/update mode) can't express replacement or deletion.
  *
  * Per batch: (1) compact the batch to its LAST change per key by
  * `seqCol` — a CDC feed legitimately carries several changes for one
  * key per poll, and replaying them in sequence order is equivalent to
  * applying the final image (full-image changes, not diffs); (2)
  * [[graft.operators.Merge.mergeIntoPartitioned]] rewrites only the
  * partitions the batch touches. Replay safety: `foreachBatch` is
  * at-least-once, and a re-applied batch is a no-op by construction
  * (same full images merged twice ⇒ same table), so the sink is
  * effectively idempotent without a transaction log.
  */
object StreamingCdc {

  /** Start the maintenance query. `changes` must carry the base table's
    * columns plus `seqCol` (change order within a key) and `deleteCol`
    * (true = remove the key). The caller owns checkpointing/trigger via
    * the returned query's configuration — this uses the session's
    * defaults and processing-time micro-batches. */
  def applyChanges(changes: DataFrame, basePath: String, keys: Seq[String],
                   partitionCol: String, seqCol: String,
                   deleteCol: String): StreamingQuery = {
    require(!changes.columns.contains("_graft_cdc_rn"),
      "changes may not carry the internal column _graft_cdc_rn")
    changes.writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          val latest = lastPerKey(batch, keys, seqCol)
          graft.operators.Merge.mergeIntoPartitioned(
            batch.sparkSession, basePath, latest, keys, partitionCol,
            Some(deleteCol))
          ()
        }
      }
      .start()
  }

  /** Batch-compaction shared by both sinks: keep each key's LAST change
    * by `seqCol` (full-image changes — replaying in order ≡ applying
    * the final image). */
  private def lastPerKey(batch: Dataset[Row], keys: Seq[String],
                         seqCol: String): DataFrame = {
    require(!batch.columns.contains("_graft_cdc_rn"),
      "changes may not carry the internal column _graft_cdc_rn")
    batch
      .withColumn("_graft_cdc_rn", row_number().over(
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col(seqCol).desc)))
      .filter(col("_graft_cdc_rn") === 1)
      .drop("_graft_cdc_rn", seqCol)
  }

  /** Continuous KEYED REPLICATION of one TxLog table into another — the
    * DR-mirror / cross-region primitive, closed over the engine's own
    * pieces: the source's STREAMING CHANGE FEED (`readChangeFeed=true`:
    * appends as inserts, MOR deletes/merges as positional delete
    * images) drives [[applyChangesVersioned]], so every source commit
    * becomes exactly one replica commit (the stream's one-commit
    * admission control) and the replica is exactly-once under replays
    * (txn-marked landings). Within one source MERGE commit a key sees
    * delete(old image) + insert(new image): the sequence ranks inserts
    * above deletes at the same version, so the new image wins — replay
    * order ≡ final state.
    *
    * Requires key-unique sources (the standard CDC assumption — two
    * live rows per key have no well-defined replica image); rewrite
    * commits on the source (CoW delete / overwrite / restore) abort the
    * stream loudly, as [[graft.sources.TxLogStreamProvider]] documents.
    *
    * Scale shape: change delivery is delta-sized (the CDF's contract);
    * the landing is the snapshot-cadence sink's (write cost O(replica)
    * per commit — the price of exact per-commit lineage; see
    * [[applyChangesVersioned]]'s scale note). */
  def replicate(spark: org.apache.spark.sql.SparkSession, src: String,
                dst: String, keys: Seq[String],
                checkpoint: String): StreamingQuery = {
    val cdf = spark.readStream.format("graft-txlog")
      .option("readChangeFeed", "true")
      .load(src)
    require(!cdf.columns.contains("_g_seq") && !cdf.columns.contains("_g_del"),
      "replicate: source schema collides with the replication sequence columns")
    val changes = cdf
      .withColumn("_g_seq", col("_commit_version") * 2 +
        when(col("_change_type") === "insert", 1L).otherwise(0L))
      .withColumn("_g_del", col("_change_type") === "delete")
      .drop("_change_type", "_commit_version")
    applyChangesVersioned(changes, dst, keys, "_g_seq", "_g_del",
      Some(checkpoint), Some("graft-replicate"))
  }

  /** The VERSIONED landing: each micro-batch's MERGE result becomes one
    * [[graft.sources.TxLog]] commit — the full corpus-maintenance loop
    * in one call (change stream → merge → versioned table), with every
    * pre-batch state kept readable ("train on the corpus as of version
    * V" is exact lineage, while the stream keeps writing).
    *
    * First non-empty batch initializes the table (its non-delete
    * images); every later batch reads the current snapshot, merges the
    * compacted batch, and lands the result as one copy-on-write
    * `overwrite` commit. Replay safety: `foreachBatch` is
    * at-least-once, and re-merging the same full images yields the same
    * table content — a replayed batch can add a redundant version but
    * never a wrong row (versions are cheap; content is what's pinned).
    *
    * Scale note: this is the SNAPSHOT-cadence sink — each commit
    * rewrites the table (write cost O(table) per batch), buying exact
    * version lineage. For high-frequency feeds against a large table,
    * [[applyChanges]]' partition-scoped rewrites are the hot path and
    * this sink is the periodic "cut a training snapshot" landing. */
  def applyChangesVersioned(changes: DataFrame, table: String,
                            keys: Seq[String], seqCol: String,
                            deleteCol: String,
                            checkpoint: Option[String] = None,
                            txnAppId: Option[String] = None): StreamingQuery = {
    val w = changes.writeStream
      .outputMode("update")
    checkpoint.foreach(w.option("checkpointLocation", _))
    w.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          import graft.sources.TxLog
          // the txn guard closes the at-least-once window (crash between
          // the TxLog commit and the checkpoint's commit write): a
          // replayed batchId is detected INSIDE appendIdempotent /
          // overwriteIdempotent (one log scan — no redundant pre-check
          // here; the merge DataFrame below is lazy, so a replayed
          // batch returns None before any plan executes), so the
          // landing is exactly-once — no redundant version, and the
          // snapshot a pinned reader saw never silently reshuffles.
          // Without txnAppId the replay is still CONTENT-idempotent
          // (re-merging the same full images yields the same table) but
          // may add a redundant version.
          val latest = lastPerKey(batch, keys, seqCol)
          if (TxLog.versions(spark, table).isEmpty) {
            val first = latest.filter(!col(deleteCol)).drop(deleteCol)
            txnAppId match {
              case Some(app) =>
                TxLog.appendIdempotent(spark, table, first, app, batchId)
              case None => TxLog.append(spark, table, first)
            }
          } else {
            val merged = graft.operators.Merge.mergeUpsert(
              TxLog.read(spark, table), latest, keys, Some(deleteCol))
            txnAppId match {
              case Some(app) =>
                TxLog.overwriteIdempotent(spark, table, merged, app, batchId)
              case None => TxLog.overwrite(spark, table, merged)
            }
          }
          ()
        }
      }
      .start()
  }
}
