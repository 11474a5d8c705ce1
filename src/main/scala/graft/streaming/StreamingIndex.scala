package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextIndex
import graft.sources.TxLog

/** CONTINUOUS index maintenance — the round-10 pieces composed into the
  * full corpus-to-retrieval loop: documents land as [[TxLog]] commits
  * (e.g. via [[TxLog.appendSink]]), the `graft-txlog` streaming source
  * replays those commits one micro-batch each, and every batch's new
  * documents fold into a versioned [[TextIndex]] via
  * [[TextIndex.appendDelta]] — so the searchable index trails the
  * corpus by one micro-batch, each index version maps to a corpus
  * commit, and NOTHING is ever re-indexed (per batch: delta-sized
  * postings work + a vocabulary-sized df merge; the indexed corpus is
  * never rescanned).
  *
  * Replay safety (`foreachBatch` is at-least-once): a batch whose doc
  * ids are ALL already indexed is a replay of a fully-applied batch —
  * skipped exactly (append-only ids make this sound). A PARTIAL
  * overlap means an interrupted maintenance op (or id reuse) and fails
  * LOUDLY through [[TextIndex.appendDelta]]'s guard — silent
  * double-counting would corrupt every BM25 score. */
object StreamingIndex {

  def maintain(spark: SparkSession, corpusTable: String, indexTable: String,
               checkpoint: String): StreamingQuery =
    spark.readStream.format("graft-txlog").load(corpusTable)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          val docs = batch.drop("_commit_version")
          val postings = s"$indexTable/postings"
          if (TxLog.versions(spark, postings).isEmpty) {
            TextIndex.saveVersioned(docs, indexTable); ()
          } else {
            val ids = docs.select("doc_id").distinct()
            val newIds = ids.join(
              TxLog.read(spark, postings).select("doc_id").distinct(),
              Seq("doc_id"), "left_anti")
            if (newIds.isEmpty) () // full replay of an applied batch: skip
            else { TextIndex.appendDelta(spark, indexTable, docs); () }
          }
        }
      }
      .start()
}
