package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.MatView

/** CONTINUOUS materialized-view maintenance: the source table's commits
  * replay through the `graft-txlog` streaming source, and each
  * micro-batch triggers one [[MatView.refresh]] — so the aggregate view
  * trails the source by at most one micro-batch, forever, with each
  * refresh folding only the unapplied delta.
  *
  * The batch CONTENT is deliberately unused: refresh reads the source
  * log itself, so the stream is a pure commit-arrival trigger. That
  * makes every at-least-once edge safe by construction — a replayed
  * trigger finds the watermark already at the source head and no-ops
  * (no view version, no double fold); a trigger that fires after
  * SEVERAL commits landed folds them all in one exact delta; and a
  * crash between the view commit and the checkpoint write is the
  * replayed-trigger case, not a corruption ([[MatView.refresh]]'s
  * watermark rides inside the view's own commit log).
  *
  * Rewrite commits (overwrite / merge / deleteWhere) must not kill the
  * stream OR go stale: the source reads with `skipChangeCommits` so a
  * rewrite plans as an EMPTY batch rather than a loud abort, and the
  * trigger fires on EVERY batch — empty included — so that very batch's
  * refresh performs the recompute fallback the rewrite demands. */
object StreamingMatView {

  def maintain(spark: SparkSession, srcTable: String, mvTable: String,
               keyCols: Seq[String], valCol: String,
               checkpoint: String): StreamingQuery =
    spark.readStream.format("graft-txlog")
      .option("skipChangeCommits", "true")
      .load(srcTable)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        // trigger-only: refresh even on an empty batch (a rewrite commit
        // delivers no rows but obligates the recompute fallback)
        MatView.refresh(batch.sparkSession, srcTable, mvTable, keyCols, valCol)
        ()
      }
      .start()

  /** Continuous JOIN-MV maintenance: TWO trigger streams — one on the
    * fact table, one on the dim — each firing the same
    * [[MatView.refreshJoin]]. No coordination is needed between them:
    * every refresh is a pinned-read CAS ([[MatView.refreshJoin]]'s
    * race-exactness), so two triggers firing together fold the state
    * exactly once and the loser re-enters on the winner's watermarks.
    * Fact commits fold incrementally; a dim commit's trigger performs
    * the honest recompute the join algebra demands. Returns both
    * queries — stop both to stop maintenance. */
  def maintainJoin(spark: SparkSession, factTable: String, dimTable: String,
                   mvTable: String, joinKeys: Seq[String], keyCols: Seq[String],
                   valCol: String, factFilter: Option[String],
                   checkpointFact: String,
                   checkpointDim: String): (StreamingQuery, StreamingQuery) = {
    def trigger(src: String, checkpoint: String): StreamingQuery =
      spark.readStream.format("graft-txlog")
        .option("skipChangeCommits", "true")
        .load(src)
        .writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          MatView.refreshJoin(batch.sparkSession, factTable, dimTable,
            mvTable, joinKeys, keyCols, valCol, factFilter)
          ()
        }
        .start()
    (trigger(factTable, checkpointFact), trigger(dimTable, checkpointDim))
  }

  /** Continuous maintenance of a NAMED view (one built through
    * `CREATE MATERIALIZED VIEW` / a definition-persisting build): the
    * PERSISTED definition decides the trigger streams — one per source
    * table (src, or fact + dim) — each firing
    * [[MatView.refreshNamed]], so no plan is re-supplied anywhere.
    * Race-exactness is [[maintainJoin]]'s: every refresh is a
    * pinned-read CAS, two triggers firing together fold exactly once.
    * Returns one query per source; stop all to stop maintenance. */
  def maintainNamed(spark: SparkSession, mvTable: String,
                    checkpointRoot: String): Seq[StreamingQuery] =
    MatView.definedSources(spark, mvTable).zipWithIndex.map {
      case (src, i) =>
        spark.readStream.format("graft-txlog")
          .option("skipChangeCommits", "true")
          .load(src)
          .writeStream
          .option("checkpointLocation", s"$checkpointRoot/src$i")
          .foreachBatch { (batch: Dataset[Row], _: Long) =>
            MatView.refreshNamed(batch.sparkSession, mvTable)
            ()
          }
          .start()
    }
}
