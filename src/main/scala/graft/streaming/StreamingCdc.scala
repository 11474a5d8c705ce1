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
          val latest = batch
            .withColumn("_graft_cdc_rn", row_number().over(
              Window.partitionBy(keys.map(col): _*)
                .orderBy(col(seqCol).desc)))
            .filter(col("_graft_cdc_rn") === 1)
            .drop("_graft_cdc_rn", seqCol)
          graft.operators.Merge.mergeIntoPartitioned(
            batch.sparkSession, basePath, latest, keys, partitionCol,
            Some(deleteCol))
          ()
        }
      }
      .start()
  }
}
