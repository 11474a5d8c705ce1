package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.DocEventTs

/** Dev aid: throughput + state-bound smoke for the flagship streaming
  * operator (online near-dup) at 10× corpus scale — the streaming leg of
  * the PERF.md round-4 scale evidence.
  *
  * Feeds the scaled `documents` table through `MemoryStream` in
  * event-time-ordered batches with a sliding TTL, then reports wall
  * time, docs/s, and the state-row curve. The interesting assertion at
  * scale is the same one StreamingDedupSpec pins functionally: with TTL
  * on, state tracks the WINDOW (buckets touched within the TTL horizon),
  * not stream length — the final batches should show state plateauing
  * while total docs processed keeps growing.
  *
  * Usage: sbt "Test/runMain graft.StreamSmoke <sfDir> [batches]"
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("testdata-scaled/sf1x")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = GraftSession.builder("graft-stream-smoke", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
    // batch i carries event time i hours; TTL 3h → buckets idle for 3
    // batches drop once the watermark passes them
    val hourMs = 3600L * 1000
    val batches = docs.grouped(math.max(1, docs.length / nBatches)).zipWithIndex
      .map { case (b, i) =>
        b.map { case (id, text) =>
          DocEventTs(id, text, new java.sql.Timestamp(i * hourMs)) }.toSeq
      }.toSeq

    val stream = MemoryStream[DocEventTs](spark)
    val hits = StreamingDedup.nearDupHits(
      stream.toDF().withWatermark("ts", "1 hour"),
      minJ = 0.8, stateTtlMs = 3 * hourMs)
    val q = hits.writeStream.format("memory").queryName("smoke_hits")
      .outputMode("update").start()
    val t0 = System.nanoTime()
    val stateCurve = batches.zipWithIndex.map { case (b, i) =>
      stream.addData(b)
      q.processAllAvailable()
      val rows = q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      println(s"[smoke] batch $i: ${b.size} docs, state rows = $rows")
      rows
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val hitCount = spark.table("smoke_hits").count()
    q.stop()
    println(f"[smoke] ${docs.length} docs in $secs%.1f s = ${docs.length / secs}%.0f docs/s; " +
      s"$hitCount dup hits; state curve = ${stateCurve.mkString(", ")}")
    spark.stop()
  }
}
