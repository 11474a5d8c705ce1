package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.FunnelEvent

class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hhmm: String) = Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  private def latestReached(table: String): Map[Long, Int] =
    spark.table(table).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.maxBy(_._3)._2).toMap

  test("time-ordered batches reproduce the batch funnel exactly (twin equality)") {
    val events = graft.sources.Tables.events(spark, sfTiny)
      .select("user_id", "ts", "event_type")
      .as[FunnelEvent].collect().sortBy(_.ts.getTime)
    val (b1, b2) = events.splitAt(events.length / 2)
    val stream = MemoryStream[FunnelEvent](spark)
    val q = StreamingFunnel.progress(stream.toDF())
      .writeStream.format("memory").queryName("sf_twin").outputMode("update").start()
    try {
      stream.addData(b1.toIndexedSeq); q.processAllAvailable()
      stream.addData(b2.toIndexedSeq); q.processAllAvailable()
      val reached = latestReached("sf_twin")
      val streamCounts = (1 to 3).map(k => reached.values.count(_ >= k).toLong)
      val batchCounts = graft.operators.Temporal.funnel(
        graft.sources.Tables.events(spark, sfTiny)).collect()
        .sortBy(_.getInt(0)).map(_.getLong(2)).toSeq
      assert(streamCounts == batchCounts,
        s"stream $streamCounts vs batch $batchCounts")
      assert(batchCounts.head > 0, "fixture must exercise the funnel")
    } finally q.stop()
  }

  test("strict ordering in state: a purchase before the click does not convert") {
    val stream = MemoryStream[FunnelEvent](spark)
    val q = StreamingFunnel.progress(stream.toDF())
      .writeStream.format("memory").queryName("sf_order").outputMode("update").start()
    try {
      stream.addData(
        FunnelEvent(1L, ts("09:00"), "view"),
        FunnelEvent(1L, ts("09:30"), "purchase"), // before any click: no step 3
        FunnelEvent(1L, ts("10:00"), "click"))
      q.processAllAvailable()
      assert(latestReached("sf_order")(1L) == 2)
    } finally q.stop()
  }

  test("event-time TTL expires idle users; re-arrival restarts the funnel") {
    val stream = MemoryStream[FunnelEvent](spark)
    val q = StreamingFunnel.progress(
      stream.toDF().withWatermark("ts", "0 seconds"), stateTtlMs = 60000L)
      .writeStream.format("memory").queryName("sf_ttl").outputMode("update").start()
    try {
      stream.addData(FunnelEvent(1L, ts("09:00"), "view"),
        FunnelEvent(2L, ts("09:00"), "view"))
      q.processAllAvailable()
      // user 2 stays active past user 1's TTL horizon
      stream.addData(FunnelEvent(2L, ts("09:10"), "click"))
      q.processAllAvailable()
      stream.addData(FunnelEvent(2L, ts("09:11"), "purchase"))
      q.processAllAvailable()
      // user 1's state expired: a click alone cannot enter the funnel
      // (step 1 is gone), so a fresh view restarts at step 1
      stream.addData(FunnelEvent(1L, ts("09:12"), "click"))
      q.processAllAvailable()
      stream.addData(FunnelEvent(1L, ts("09:13"), "view"))
      q.processAllAvailable()
      val rows = spark.table("sf_ttl").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
      val u1 = rows.filter(_._1 == 1L).maxBy(_._3)
      assert(u1._2 == 1 && u1._3 == 1L, s"expired user must restart: $u1")
      assert(rows.filter(_._1 == 2L).maxBy(_._3)._2 == 3)
    } finally q.stop()
  }

  test("monotone refinement: an earlier view lowers the entry, enabling a later click") {
    val stream = MemoryStream[FunnelEvent](spark)
    val q = StreamingFunnel.progress(stream.toDF())
      .writeStream.format("memory").queryName("sf_refine").outputMode("update").start()
    try {
      stream.addData(FunnelEvent(1L, ts("10:00"), "view"))
      q.processAllAvailable()
      // late-arriving earlier view refines entry(0) 10:00 -> 08:00 ...
      stream.addData(FunnelEvent(1L, ts("08:00"), "view"))
      q.processAllAvailable()
      // ... so a click at 09:00 (before the ORIGINAL view) now advances
      stream.addData(FunnelEvent(1L, ts("09:00"), "click"))
      q.processAllAvailable()
      assert(latestReached("sf_refine")(1L) == 2)
    } finally q.stop()
  }
}
