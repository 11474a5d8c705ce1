package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** leftOuter + structural coverage for the stream-stream interval join
  * ([[EventStreams.clickViewAttribution]]); the inner twin-equality and
  * state-cleanup pins live in StreamingSpec. */
object StreamingJoinSpec {
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double, props: String)
}

class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._
  import StreamingJoinSpec.Ev

  private def at(hhmm: String) = Timestamp.valueOf(s"2026-01-01 $hhmm:00")
  private def ev(id: Long, hhmm: String, user: Long, typ: String) =
    Ev(id, at(hhmm), user, typ, 0.0, "{}")

  private def pairs(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getAs[Long]("click_id"),
      if (r.isNullAt(r.fieldIndex("view_id"))) None
      else Some(r.getAs[Long]("view_id")))).toSet

  test("inner: streamed pairs == batch-degraded twin on the real events table") {
    val e = graft.sources.Tables.events(spark, sfTiny)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val stream = MemoryStream[Ev](spark)
    val q = EventStreams.clickViewAttribution(stream.toDF())
      .writeStream.format("memory").queryName("ssj_real").outputMode("append").start()
    val got = try {
      val all = e.as[Ev].collect().sortBy(x => (x.ts.getTime, x.event_id))
      all.grouped((all.length + 2) / 3).foreach { b =>
        stream.addData(b.toSeq); q.processAllAvailable()
      }
      pairs(spark.table("ssj_real").collect())
    } finally q.stop()
    // batch twin: the identical code path over the batch table
    val want = pairs(EventStreams.clickViewAttribution(e).collect())
    assert(got == want, {
      val d = (got diff want).take(3) ++ (want diff got).take(3)
      s"stream/batch divergence (|got|=${got.size} |want|=${want.size}): $d"
    })
    assert(want.nonEmpty, "vacuous: the batch twin produced no pairs")
  }

  test("leftOuter: unmatched click emits null views once the watermark passes") {
    val stream = MemoryStream[Ev](spark)
    val q = EventStreams.clickViewAttribution(stream.toDF(),
        watermark = "10 minutes", joinType = "leftOuter")
      .writeStream.format("memory").queryName("ssj_outer").outputMode("append").start()
    val got = try {
      stream.addData(
        ev(1, "09:30", 1L, "view"),
        ev(2, "10:00", 1L, "click"),   // matched (30 min after the view)
        ev(3, "10:00", 2L, "click"))   // unmatched — must still emit
      q.processAllAvailable()
      // sentinels far past the click's eviction bound drive the state
      // flush — on BOTH sides, because the global watermark is the MIN
      // across watermark operators (a view-only sentinel would leave the
      // click side's watermark, and so the global one, pinned at 10:00).
      // Two sentinel batches: the first advances the watermark, the
      // second gives the engine the post-advance trigger in which the
      // evicted nulls emit — the flush live traffic provides for free.
      stream.addData(ev(98, "13:00", 9L, "click"), ev(99, "13:00", 9L, "view"))
      q.processAllAvailable()
      stream.addData(ev(97, "13:01", 9L, "view"))
      q.processAllAvailable()
      // sentinel clicks stay unevicted (the watermark never passes THEIR
      // bound) — scope the assert to the scenario's clicks
      pairs(spark.table("ssj_outer").collect()).filter(_._1 < 90)
    } finally q.stop()
    assert(got == Set((2L, Some(1L)), (3L, None)), s"got $got")
  }

  test("state bound: symmetric hash join + watermarks on both sides in the plan") {
    // structural pin: the planned streaming query must carry watermarks on
    // both sides and a stream-stream join with a time-range condition —
    // the combination Spark derives bounded state from. If a refactor
    // drops either, this assert (not an OOM three days into a run) fails.
    val stream = MemoryStream[Ev](spark)
    val q = EventStreams.clickViewAttribution(stream.toDF())
      .writeStream.format("memory").queryName("ssj_plan").outputMode("append").start()
    try {
      stream.addData(ev(1, "09:30", 1L, "view"), ev(2, "10:00", 1L, "click"))
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
