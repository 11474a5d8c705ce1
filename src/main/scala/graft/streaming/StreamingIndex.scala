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
  * ids are ALL already indexed is a replay — but "postings contain the
  * ids" alone does NOT prove the batch fully applied
  * ([[TextIndex.appendDelta]] commits postings before df/stats, so a
  * crash in that window leaves postings ahead), so the skip first
  * asserts the three index tables are in LOCKSTEP and fails loudly if
  * a prior maintenance op died mid-commit (the alternative is a stream
  * that advances past the wedge and silently serves scores missing a
  * batch's term counts forever). A PARTIAL id overlap (id reuse) is
  * equally loud. The overlap check is computed ONCE here and
  * `idsPrechecked` skips appendDelta's own index-wide duplicate scan. */
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
            val overlap = ids.join(
              TxLog.read(spark, postings).select("doc_id").distinct(),
              Seq("doc_id"), "left_semi").count()
            val total = ids.count()
            if (overlap == total) {
              // replay of an applied batch — but only if the previous
              // application COMPLETED: postings-ahead-of-df/stats means
              // a maintenance op died between commits
              val vs = Seq("postings", "df", "stats")
                .map(c => TxLog.versions(spark, s"$indexTable/$c").lastOption.getOrElse(-1L))
              require(vs.distinct.size == 1,
                s"textindex: component tables out of lockstep (versions $vs) " +
                  "— a maintenance operation was interrupted mid-commit; " +
                  "rebuild the index before resuming the stream")
              ()
            } else {
              require(overlap == 0L,
                s"textindex: $overlap of $total batch doc ids are already " +
                  "indexed (partial overlap) — id reuse or an interrupted " +
                  "append; rebuild the index")
              TextIndex.appendDelta(spark, indexTable, docs, idsPrechecked = true)
              ()
            }
          }
        }
      }
      .start()
}
