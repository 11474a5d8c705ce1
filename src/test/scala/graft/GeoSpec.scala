package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GeoUtil
import graft.operators.Geo

/** The geospatial surface ([[graft.functions.GeoUtil]] +
  * [[graft.operators.Geo]]):
  *  - geohash encode pinned against PUBLISHED vectors, decode proven
  *    structurally (containment, prefix = containment, width halving);
  *  - haversine pinned against a published city-pair distance;
  *  - the radius join's plan REQUIREd to be a hash join (bucketed —
  *    never a cartesian), its result REQUIREd equal to the all-pairs
  *    truth on a seeded corpus. */
class GeoSpec extends AnyFunSuite {

  test("geohash encode matches published vectors") {
    assert(GeoUtil.encode(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(GeoUtil.encode(42.605, -5.603, 5) == "ezs42")
    assert(GeoUtil.encode(0.0, 0.0, 1) == "s")
    // the domain is HALF-OPEN (r15 advice): the inclusive corner would
    // encode into a cell whose half-open box does not contain it —
    // rejected loudly; the top cell is reached from just inside
    assert(GeoUtil.encode(math.nextDown(90.0), math.nextDown(180.0), 4)
      == "zzzz")
    assert(GeoUtil.encode(-90.0, -180.0, 4) == "0000")
    intercept[IllegalArgumentException](GeoUtil.encode(90.0, 0.0, 4))
    intercept[IllegalArgumentException](GeoUtil.encode(0.0, 180.0, 4))
    // the rejected corners still satisfy containment when wrapped/nudged
    val (la, lb, lo, hi) = GeoUtil.decodeBox(
      GeoUtil.encode(math.nextDown(90.0), -180.0, 6))
    assert(math.nextDown(90.0) >= la && math.nextDown(90.0) < lb &&
      -180.0 >= lo && -180.0 < hi)
  }

  test("geohash decode: containment, prefix nesting, width halving") {
    val r = new java.util.Random(42)
    for (_ <- 0 until 500) {
      val lat = r.nextDouble() * 180 - 90
      val lon = r.nextDouble() * 360 - 180
      val h = GeoUtil.encode(lat, lon, 9)
      val (la, lb, lo, hi) = GeoUtil.decodeBox(h)
      assert(lat >= la && lat < lb && lon >= lo && lon < hi, s"($lat,$lon) $h")
      // every prefix cell contains the full-precision cell
      for (p <- 1 until 9) {
        val (pla, plb, plo, phi) = GeoUtil.decodeBox(h.take(p))
        assert(pla <= la && plb >= lb && plo <= lo && phi >= hi,
          s"prefix $p of $h does not nest")
      }
    }
    // widths: one char = 5 bits = lon halved 3×, lat halved 2× (even
    // bits are lon); two chars swap the split
    val (la1, lb1, lo1, hi1) = GeoUtil.decodeBox("s")
    assert(lb1 - la1 == 45.0 && hi1 - lo1 == 45.0)
    intercept[IllegalArgumentException](GeoUtil.decodeBox("abc!"))
    intercept[IllegalArgumentException](GeoUtil.encode(91.0, 0.0, 5))
  }

  test("haversine matches a published city-pair distance") {
    // Paris ↔ New York ≈ 5837 km (great-circle, mean-radius sphere)
    val km = GeoUtil.haversineKm(48.8566, 2.3522, 40.7128, -74.0060)
    assert(math.abs(km - 5837.0) < 5.0, s"got $km")
    assert(GeoUtil.haversineKm(1.0, 2.0, 1.0, 2.0) == 0.0)
    // antipodal cap: half the mean circumference
    val anti = GeoUtil.haversineKm(0, 0, 0, 180)
    assert(math.abs(anti - math.Pi * 6371.0088) < 1e-6)
  }

  test("radius join: hash-join plan, equals all-pairs truth") {
    val spark = SharedSpark.spark
    val df = Geo.qgeoRadiusJoin(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "the radius join must stay grid-bucketed, never all-pairs")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // all-pairs truth, driver-side, over the same synthetic coords
    val pts = graft.sources.Tables.customer(spark, "/root/testdata/sf0.001")
      .select("c_custkey").collect().map(_.getLong(0))
      .map(k => (k, (k * 7919) % 120000000 - 60000000,
        (k * 104729) % 360000000 - 180000000))
    val d2 = 8000000L * 8000000L
    val want = (for {
      (k1, la1, lo1) <- pts
      (k2, la2, lo2) <- pts
      if k1 != k2 &&
        (la1 - la2) * (la1 - la2) + (lo1 - lo2) * (lo1 - lo2) <= d2
    } yield (k1, k2))
      .groupBy(_._1).toSeq
      .map { case (k, ps) => (k, ps.length.toLong, ps.map(_._2).sum) }
      .sortBy(_._1)
    assert(got.toSeq == want, "bucketed join differs from all-pairs truth")
    assert(want.nonEmpty, "fixture produced no neighbor pairs")
  }

  test("capped radius join: rank-truncated truth, fan-out bounded, no cartesian (r16)") {
    val spark = SharedSpark.spark
    val df = Geo.qgeoRadiusCapped(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "the capped radius join must stay grid-bucketed")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // truth over the RANK-KEPT points: first 8 per cell by key
    val pts = graft.sources.Tables.customer(spark, "/root/testdata/sf0.001")
      .select("c_custkey").collect().map(_.getLong(0))
      .map(k => (k, (k * 7919) % 120000000 - 60000000,
        (k * 104729) % 360000000 - 180000000))
    val kept = pts
      .groupBy { case (_, la, lo) =>
        ((lo + 180000000L) / 8000000L, (la + 60000000L) / 8000000L) }
      .values.flatMap(_.sortBy(_._1).take(8)).toSeq
    val d2 = 8000000L * 8000000L
    val want = (for {
      (k1, la1, lo1) <- kept
      (k2, la2, lo2) <- kept
      if k1 != k2 &&
        (la1 - la2) * (la1 - la2) + (lo1 - lo2) * (lo1 - lo2) <= d2
    } yield (k1, k2))
      .groupBy(_._1).toSeq
      .map { case (k, ps) => (k, ps.length.toLong, ps.map(_._2).sum) }
      .sortBy(_._1)
    assert(got.toSeq == want, "capped join differs from rank-truncated truth")
    assert(want.nonEmpty, "capped fixture produced no neighbor pairs")
    // the governed output law: ≤ 9·cap neighbors per point, ever
    assert(got.forall(_._2 <= 9L * 8L),
      "per-point fan-out exceeded the 9·cap bound the cap exists to enforce")
  }

  test("cell row certifies the string path and matches the kernel") {
    val spark = SharedSpark.spark
    val rows = Geo.qgeoCells(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val totalN = rows.map(_.getLong(1)).sum
    val nCust = graft.sources.Tables.customer(spark, "/root/testdata/sf0.001").count()
    assert(totalN == nCust, "every point lands in exactly one cell")
    for (r <- rows) {
      val cell = r.getLong(0)
      assert(cell >= 0 && cell < (1L << 14), s"cell $cell out of 14-bit range")
    }
  }
}
