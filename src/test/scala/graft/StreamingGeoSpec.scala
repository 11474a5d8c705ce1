package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingGeo

class StreamingGeoSpec extends SparkSpec {
  import spark.implicits._

  case class Pt(point_id: Long, lat_u: Long, lon_u: Long)

  private val R = 8000000L

  /** The batch fixture's coordinate formula ([[graft.operators.Geo]]). */
  private def coords(k: Long): (Long, Long) =
    ((k * 7919) % 120000000 - 60000000, (k * 104729) % 360000000 - 180000000)

  test("streaming radius search equals the ordered-pair batch truth") {
    val pts = (0L until 60L).map { k =>
      val (la, lo) = coords(k); Pt(k, la, lo)
    }
    // truth: (later, earlier) pairs within R, exact integer arithmetic
    val want = (for {
      a <- pts; b <- pts if b.point_id < a.point_id
      dla = a.lat_u - b.lat_u; dlo = a.lon_u - b.lon_u
      if dla * dla + dlo * dlo <= R * R
    } yield (a.point_id, b.point_id)).toSet
    assert(want.nonEmpty, "fixture produced no close pairs")

    val stream = MemoryStream[Pt](spark)
    val q = StreamingGeo.neighborsSeen(stream.toDF(), radiusMicro = R)
      .writeStream.format("memory").queryName("geo_nbrs")
      .outputMode("update").start()
    val got = try {
      // one point per micro-batch pins arrival order exactly
      pts.foreach { p => stream.addData(p); q.processAllAvailable() }
      spark.table("geo_nbrs").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally q.stop()
    assert(got == want, s"streaming pairs differ: missing=${want -- got} " +
      s"extra=${got -- want}")
  }

  test("each pair is found exactly once; dist2 is the exact integer") {
    val stream = MemoryStream[Pt](spark)
    val q = StreamingGeo.neighborsSeen(stream.toDF(), radiusMicro = 100L)
      .writeStream.format("memory").queryName("geo_once")
      .outputMode("update").start()
    try {
      stream.addData(Pt(1L, 0L, 0L)); q.processAllAvailable()
      // same cell, adjacent cell, and out-of-range arrivals
      stream.addData(Pt(2L, 30L, 40L)); q.processAllAvailable()
      stream.addData(Pt(3L, -60L, 80L)); q.processAllAvailable()
      stream.addData(Pt(4L, 5000L, 5000L)); q.processAllAvailable()
      val rows = spark.table("geo_once").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows.count { case (a, b, _) => a == 2L && b == 1L } == 1,
        s"pair (2,1) not found exactly once: $rows")
      assert(rows.contains((2L, 1L, 2500L)), s"exact dist2 wrong: $rows")
      // (3,1): d2 = 60^2+80^2 = 10000 = R^2 → inclusive boundary holds
      assert(rows.contains((3L, 1L, 10000L)), s"boundary pair missed: $rows")
      // (3,2): d2 = 90^2+40^2 = 9700 ≤ R^2
      assert(rows.contains((3L, 2L, 9700L)), s"pair (3,2) missed: $rows")
      assert(!rows.exists { case (a, b, _) => a == 4L || b == 4L },
        s"far point matched: $rows")
    } finally q.stop()
  }

  test("FIFO cell cap bounds state; TTL requires a ts column") {
    intercept[IllegalArgumentException] {
      StreamingGeo.neighborsSeen(
        Seq((1L, 0L, 0L)).toDF("point_id", "lat_u", "lon_u"),
        radiusMicro = 10L, stateTtlMs = 1000L)
    }
    val stream = MemoryStream[Pt](spark)
    // cap 2: the oldest resident is evicted, so a later probe misses it
    val q = StreamingGeo.neighborsSeen(stream.toDF(), radiusMicro = 1000L,
      maxPerCell = 2)
      .writeStream.format("memory").queryName("geo_cap")
      .outputMode("update").start()
    try {
      stream.addData(Pt(1L, 0L, 0L)); q.processAllAvailable()
      stream.addData(Pt(2L, 1L, 1L)); q.processAllAvailable()
      stream.addData(Pt(3L, 2L, 2L)); q.processAllAvailable()
      stream.addData(Pt(4L, 3L, 3L)); q.processAllAvailable()
      val got = spark.table("geo_cap").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((4L, 3L)) && got.contains((4L, 2L)),
        s"recent residents missed: $got")
      assert(!got.contains((4L, 1L)),
        s"evicted resident still matched: $got")
    } finally q.stop()
  }
}
