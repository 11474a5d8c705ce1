package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.{TxLog, TxLogConcurrentModificationException}

/** CONTINUOUS small-file maintenance for a streaming-ingested TxLog
  * table: every commit arrival triggers one
  * [[TxLog.optimizeBinPack]], so the micro-batch small-file tail is
  * packed away as fast as it forms and the live file count stays
  * bounded by the data size, not the commit count — the ops loop a
  * 100 TB streaming-fed table otherwise needs a nightly job for.
  *
  * Same trigger-only design as [[StreamingMatView]]: the batch CONTENT
  * is unused (the pack reads the table's own log), so every
  * at-least-once replay edge is safe — a replayed trigger finds fewer
  * than two small files and no-ops, and `skipChangeCommits` keeps
  * rewrite commits (the packs themselves!) from killing the trigger
  * stream.
  *
  * Liveness under contention: a pack that loses its OCC race to a
  * concurrent DELETE/overwrite (remove- or dv-carrying commits stale
  * its remove-set) is SKIPPED, not fatal — that very commit retriggers
  * the stream, and the next pack runs against the new state. Pure
  * concurrent appends are retried past inside the commit loop itself. */
object StreamingOptimize {

  def maintain(spark: SparkSession, table: String, targetBytes: Long,
               checkpoint: String): StreamingQuery =
    spark.readStream.format("graft-txlog")
      .option("skipChangeCommits", "true")
      .load(table)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        try { TxLog.optimizeBinPack(batch.sparkSession, table, targetBytes); () }
        catch {
          case _: TxLogConcurrentModificationException => () // retriggered by the winner
        }
      }
      .start()
}
