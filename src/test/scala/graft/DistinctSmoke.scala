package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDistinct
import graft.streaming.StreamingDistinct.KeyedEventTs

/** Dev aid: throughput + state-bound smoke for [[StreamingDistinct]] at
  * 10× event scale — the sketch-in-state claim made empirical. Feeds the
  * scaled `events` table (user_id per hour key) through `MemoryStream`
  * in event-time order with a sliding TTL; the assertion that matters at
  * scale: state rows track the number of ACTIVE hour keys (bounded by
  * the TTL horizon), not the number of distinct users — a distinct-value
  * state design would grow with users forever.
  *
  * Usage: sbt "Test/runMain graft.DistinctSmoke <sfDir> [batches]"
  */
object DistinctSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("testdata-scaled/sf1x")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = GraftSession.builder("graft-distinct-smoke", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // hour-of-stream is the grouping key; user_id is the counted value
    val events = graft.sources.Tables.events(spark, dir)
      .select("user_id").as[Long].collect()
    val hourMs = 3600L * 1000
    val batches = events.grouped(math.max(1, events.length / nBatches)).zipWithIndex
      .map { case (b, i) =>
        b.map(u => KeyedEventTs(s"hour-$i", u, new java.sql.Timestamp(i * hourMs))).toSeq
      }.toSeq

    val stream = MemoryStream[KeyedEventTs](spark)
    val q = StreamingDistinct.distinctPerKey(
      stream.toDF().withWatermark("ts", "1 hour"), stateTtlMs = 3 * hourMs)
      .writeStream.format("memory").queryName("smoke_distinct")
      .outputMode("update").start()
    val t0 = System.nanoTime()
    val stateCurve = batches.zipWithIndex.map { case (b, i) =>
      stream.addData(b)
      q.processAllAvailable()
      q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()
    val latest = spark.table("smoke_distinct").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.maxBy(_._3)._2).toMap
    println(f"[smoke] ${events.length} events in $secs%.1f s = " +
      f"${events.length / secs}%.0f events/s over ${latest.size} hour keys; " +
      s"state curve = ${stateCurve.mkString(", ")}")
    println(s"[smoke] sample estimates: ${latest.toSeq.sortBy(_._1).take(3).mkString(", ")}")
    spark.stop()
  }
}
