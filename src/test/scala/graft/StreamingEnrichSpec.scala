package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingEnrich
import graft.streaming.StreamingEnrich.EnrichEvent

class StreamingEnrichSpec extends SparkSpec {
  import spark.implicits._

  private def at(hhmm: String) = Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  test("clicks enrich with the latest prior view; simultaneous view is visible") {
    val stream = MemoryStream[EnrichEvent](spark)
    val q = StreamingEnrich.asofEnrich(stream.toDF())
      .writeStream.format("memory").queryName("enriched").outputMode("update").start()
    val got = try {
      stream.addData(
        EnrichEvent(100, 1L, "view", at("10:00")),
        EnrichEvent(200, 1L, "click", at("09:50")), // BEFORE any view -> None
        EnrichEvent(201, 1L, "click", at("10:20"))) // after view 100
      q.processAllAvailable()
      stream.addData(
        EnrichEvent(101, 1L, "view", at("11:00")),
        EnrichEvent(202, 1L, "click", at("11:00")), // simultaneous -> view 101
        EnrichEvent(203, 2L, "click", at("11:00"))) // other user, no views
      q.processAllAvailable()
      spark.table("enriched").collect()
        .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
    } finally q.stop()
    assert(got == Map(200L -> None, 201L -> Some(100L),
      202L -> Some(101L), 203L -> None), s"got $got")
  }

  test("event-time-ordered stream == batch as-of join on real events") {
    val e = graft.sources.Tables.events(spark, sfTiny)
      .filter(col("event_type").isin("view", "click"))
      .select("event_id", "user_id", "event_type", "ts")
    // feed in event-time order, split into 4 batches — the log-shipping case
    val ordered = e.as[EnrichEvent].collect()
      .sortBy(x => (x.ts.getTime, if (x.event_type == "view") 0 else 1, x.event_id))
    val stream = MemoryStream[EnrichEvent](spark)
    val q = StreamingEnrich.asofEnrich(stream.toDF())
      .writeStream.format("memory").queryName("enriched_real").outputMode("update").start()
    val got = try {
      ordered.grouped((ordered.length + 3) / 4).foreach { b =>
        stream.addData(b.toSeq); q.processAllAvailable()
      }
      spark.table("enriched_real").collect()
        .map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    } finally q.stop()
    // batch truth: qe_asof (which pre-dedupes views per (user, ts) to the
    // max id — same tie rule as the streaming state update)
    val want = SparkEntry.queries("qe_asof")(spark, sfTiny).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got == want, {
      val diff = (got.keySet ++ want.keySet)
        .filter(k => got.get(k) != want.get(k)).take(5)
      s"divergent clicks: ${diff.map(k => (k, got.get(k), want.get(k)))}"
    })
  }
}
