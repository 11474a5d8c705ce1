package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingJoin

object StreamingJoinSpec {
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String)
}

class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._
  import StreamingJoinSpec.Ev

  private def at(hhmm: String) = Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  private def pairs(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet

  test("inner: stream-stream pairs == batch twin on real events") {
    val e = graft.sources.Tables.events(spark, sfTiny)
      .select("event_id", "ts", "user_id", "event_type")
    val stream = MemoryStream[Ev](spark)
    val q = StreamingJoin.viewClickIntervalJoin(stream.toDF(), horizon = "1 hour")
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    val got = try {
      val all = e.as[Ev].collect().sortBy(x => (x.ts.getTime, x.event_id))
      all.grouped((all.length + 2) / 3).foreach { b =>
        stream.addData(b.toSeq); q.processAllAvailable()
      }
      pairs(spark.table("ssj").collect())
    } finally q.stop()
    val want = pairs(
      StreamingJoin.viewClickIntervalJoinBatch(e, horizon = "1 hour").collect())
    assert(got == want, {
      val d = (got diff want).take(3) ++ (want diff got).take(3)
      s"stream/batch divergence (|got|=${got.size} |want|=${want.size}): $d"
    })
    assert(want.nonEmpty, "vacuous: the batch twin produced no pairs")
  }

  test("inner: a view OUTSIDE the horizon or AFTER the click never pairs") {
    val stream = MemoryStream[Ev](spark)
    val q = StreamingJoin.viewClickIntervalJoin(stream.toDF(), horizon = "1 hour")
      .writeStream.format("memory").queryName("ssj_edge").outputMode("append").start()
    val got = try {
      stream.addData(
        Ev(1, at("08:00"), 1L, "view"),   // 2h before click — outside horizon
        Ev(2, at("09:30"), 1L, "view"),   // inside horizon
        Ev(3, at("10:00"), 1L, "view"),   // simultaneous — inside (<=)
        Ev(4, at("10:05"), 1L, "view"),   // after the click — never
        Ev(5, at("10:00"), 1L, "click"),
        Ev(6, at("10:00"), 2L, "click"))  // other user — no views
      q.processAllAvailable()
      pairs(spark.table("ssj_edge").collect())
    } finally q.stop()
    assert(got == Set((5L, Some(2L)), (5L, Some(3L))), s"got $got")
  }

  test("leftOuter: unmatched click emits null views once the watermark passes") {
    val stream = MemoryStream[Ev](spark)
    val q = StreamingJoin.viewClickIntervalJoin(stream.toDF(),
        horizon = "1 hour", watermark = "10 minutes", joinType = "leftOuter")
      .writeStream.format("memory").queryName("ssj_outer").outputMode("append").start()
    val got = try {
      stream.addData(
        Ev(1, at("09:30"), 1L, "view"),
        Ev(2, at("10:00"), 1L, "click"),  // matched
        Ev(3, at("10:00"), 2L, "click"))  // unmatched — must still emit
      q.processAllAvailable()
      // sentinels far past click_ts + watermark drive eviction — on BOTH
      // sides, because the global watermark is the MIN across watermark
      // operators (a view-only sentinel would leave the click side's
      // watermark, and so the global one, pinned at 10:00). Two sentinel
      // batches: the first advances the watermark, the second gives the
      // engine the post-advance trigger in which evicted nulls emit —
      // the flush continuing production traffic provides for free.
      stream.addData(Ev(98, at("13:00"), 9L, "click"),
                     Ev(99, at("13:00"), 9L, "view"))
      q.processAllAvailable()
      stream.addData(Ev(97, at("13:01"), 9L, "view"))
      q.processAllAvailable()
      // sentinel clicks themselves stay unevicted (watermark never passes
      // THEIR horizon) — scope the assert to the scenario's clicks
      pairs(spark.table("ssj_outer").collect()).filter(_._1 < 90)
    } finally q.stop()
    assert(got == Set((2L, Some(1L)), (3L, None)), s"got $got")
  }

  test("state bound: the join keeps watermarked eviction, not forever-state") {
    // structural pin: the planned streaming query must carry watermarks on
    // both sides and a stream-stream join with a time-range condition —
    // the combination Spark derives bounded state from. If a refactor
    // drops either, this assert (not an OOM three days into a run) fails.
    val stream = MemoryStream[Ev](spark)
    val q = StreamingJoin.viewClickIntervalJoin(stream.toDF(), horizon = "1 hour")
      .writeStream.format("memory").queryName("ssj_plan").outputMode("append").start()
    try {
      stream.addData(Ev(1, at("09:30"), 1L, "view"), Ev(2, at("10:00"), 1L, "click"))
      q.processAllAvailable()
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) { q.explain(true) }
      val plan = buf.toString("UTF-8")
      assert(plan.contains("StreamingSymmetricHashJoin"),
        s"expected a stream-stream symmetric hash join in:\n$plan")
      assert("watermark".r.findAllIn(plan.toLowerCase).size >= 2,
        s"expected watermarks on both sides in:\n$plan")
    } finally q.stop()
  }
}
