package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{GeoUtil, GraftFunctions}
import graft.sources.Tables

/** Geospatial bucketing and joins — the spatial leg of the engine:
  * geohash cells (the [[graft.functions.GeohashEncode]] expression),
  * integer-exact grid aggregation, and the GRID-BUCKETED radius join
  * that replaces the all-pairs O(n²) a naive "points within D" query
  * plans. The shape is the 2-D sibling of the LSH band join: bucket
  * each point into a D-sized cell, expand each probe into its 3×3
  * neighborhood (9 equi-join keys — a constant), hash-join on the cell
  * id, then refine with the EXACT distance predicate. Work per point is
  * bounded by local density, never by n, which is the only radius-join
  * shape that survives 10¹¹ points.
  *
  * Coordinates are synthesized deterministically from customer keys in
  * integer MICRO-DEGREES, so every cell id, every pair distance, and
  * every aggregate is exact integer arithmetic the DuckDB oracle
  * recomputes closed-form — no float boundary can flip a bucket. The
  * one float row (haversine) is isolated in `qgeo_haversine` with the
  * repo's established round-to-6 contract. */
object Geo {

  private val T = Tables

  /** Deterministic µdeg coordinates: lat in [-60°, 60°), lon in
    * [-180°, 180°), spread by coprime multipliers (both engines
    * recompute this formula exactly in BIGINT). */
  private def withCoords(df: DataFrame): DataFrame =
    df.select(col("c_custkey").cast("long").as("k"))
      .withColumn("lat_u", (col("k") * 7919L) % 120000000L - 60000000L)
      .withColumn("lon_u", (col("k") * 104729L) % 360000000L - 180000000L)

  /** QGEO1 — geohash-cell aggregation, integer-exact: quantize each
    * axis to 7 bits over its full range and interleave with the
    * [[graft.functions.ZOrderKey]] kernel (geohash's own bit order —
    * lon on the high bit of each pair), then aggregate per cell. The
    * STRING geohash path is certified in-row on every record: the
    * 12-char encode's decoded bounding box must contain the point, and
    * the 6-char encode must be its prefix (the property that makes
    * prefix matching = spatial containment). */
  def qgeoCells(spark: SparkSession, d: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val pts = withCoords(T.customer(spark, d))
      .withColumn("lat_q", expr("(lat_u + 60000000) * 128 div 120000000"))
      .withColumn("lon_q", expr("(lon_u + 180000000) * 128 div 360000000"))
    // in-row certification of the string path, scan-side
    val bad = pts
      .withColumn("lat", col("lat_u") / 1000000.0d)
      .withColumn("lon", col("lon_u") / 1000000.0d)
      .selectExpr("lat", "lon", "geohash(lat, lon, 12) AS h12",
        "geohash(lat, lon, 6) AS h6")
      .mapPartitions { it =>
        var n = 0L
        it.foreach { r =>
          val (lat, lon) = (r.getDouble(0), r.getDouble(1))
          val (h12, h6) = (r.getString(2), r.getString(3))
          val (la, lb, lo, hi) = GeoUtil.decodeBox(h12)
          if (!(lat >= la && lat < lb && lon >= lo && lon < hi) ||
            !h12.startsWith(h6)) n += 1
        }
        Iterator.single(n)
      }(org.apache.spark.sql.Encoders.scalaLong).reduce(_ + _)
    require(bad == 0L, s"geo: $bad rows failed the geohash containment/prefix cert")
    pts.selectExpr("zorder_key(lat_q, lon_q) AS cell", "k")
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("cell")
  }

  /** Radius in µdeg for the planar join (≈0.9° — chosen so the sf0.01
    * point density yields a few neighbors per point). */
  private val RadiusMicro = 8000000L

  /** QGEO2 — exact planar radius join via grid bucketing: every point
    * lands in ONE D-sized cell; each probe side expands into the 3×3
    * neighborhood, hash-joins on the cell id, and refines with the
    * exact integer predicate Δlat² + Δlon² ≤ D². A pair in distinct
    * cells meets exactly once (the probe copy targeting the build
    * point's unique cell), so no dedup shuffle is needed. Per-point
    * neighbor count + key checksum, both-directions semantics. */
  def qgeoRadiusJoin(spark: SparkSession, d: String): DataFrame =
    radiusNeighborAgg(spark, d, maxPerCell = None)

  /** Per-cell fan-out cap the CAPPED radius row binds at: each cell
    * contributes only its first `cap` points BY KEY — the documented
    * density governor (the `ngramJaccardPairs(maxDocFreq)` pattern,
    * deterministic because the rank orders by the unique key), mirrored
    * closed-form by the oracle's `row_number() OVER (PARTITION BY cell
    * ORDER BY k)`. */
  private val CellCap = 8

  /** The shared radius-join body. `maxPerCell` governs the honest
    * output law (pairs ∝ n × local density): with a cap, each cell
    * keeps only its first `cap` points by key BEFORE the join — every
    * surviving probe meets ≤ 9·cap build points and the kept set is
    * bounded by cells × cap (a constant of the geometry: area / D²),
    * so pair output stays bounded at ANY density and the row's wall
    * tracks n (the one governor scan) instead of n × density — the
    * knob the r15 64× adjudication asked to expose (ScaleUp folds
    * every copy into one coordinate space, so uncapped pairs grow
    * ∝ n²). The rank truncation is one key-partitioned window over the
    * cell id — the same shuffle shape the banded dedup family uses. */
  private def radiusNeighborAgg(spark: SparkSession, d: String,
                                maxPerCell: Option[Int]): DataFrame = {
    val pts0 = withCoords(T.customer(spark, d))
      .withColumn("cx", expr(s"(lon_u + 180000000) div $RadiusMicro"))
      .withColumn("cy", expr(s"(lat_u + 60000000) div $RadiusMicro"))
    val pts = maxPerCell.fold(pts0) { cap =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cx", "cy").orderBy("k")
      pts0.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= cap).drop("_rn")
    }
    val offsets = Seq(-1L, 0L, 1L)
      .flatMap(dx => Seq(-1L, 0L, 1L).map(dy => (dx, dy)))
    val probe = pts.crossJoin(
      pts.sparkSession.createDataFrame(offsets).toDF("dx", "dy"))
      .select(col("k").as("k1"), col("lat_u").as("lat1"),
        col("lon_u").as("lon1"),
        (col("cx") + col("dx")).as("jx"), (col("cy") + col("dy")).as("jy"))
    val build = pts.select(col("k").as("k2"), col("lat_u").as("lat2"),
      col("lon_u").as("lon2"), col("cx").as("jx"), col("cy").as("jy"))
    val dla = col("lat1") - col("lat2")
    val dlo = col("lon1") - col("lon2")
    probe.join(build, Seq("jx", "jy"))
      .filter(col("k1") =!= col("k2") &&
        dla * dla + dlo * dlo <= lit(RadiusMicro * RadiusMicro))
      .groupBy(col("k1").as("k"))
      .agg(count(lit(1)).as("n_near"), sum("k2").as("near_sum"))
      .orderBy("k")
  }

  /** QGEO4 — the CAPPED radius join (r15 verdict task: govern the
    * output law): identical semantics to [[qgeoRadiusJoin]] over the
    * density-governed point set — each cell contributes only its first
    * [[CellCap]] points by key (both sides), so pair output is ≤ 9·cap
    * per point and bounded by cells × cap² overall: the row's wall
    * tracks n at 64× instead of n × density. The oracle rebuilds the
    * truncation closed-form (row_number per cell ordered by the unique
    * key), so the row is exact whether or not the cap binds at a given
    * SF. */
  def qgeoRadiusCapped(spark: SparkSession, d: String): DataFrame =
    radiusNeighborAgg(spark, d, maxPerCell = Some(CellCap))

  /** QGEO3 — haversine distances (the one FLOAT row, isolated): sampled
    * customers' great-circle km to a fixed anchor, rounded to 6 — the
    * repo's established double contract (q39/q45). Uses the same IUGG
    * radius constant the oracle SQL spells out. */
  def qgeoHaversine(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    withCoords(T.customer(spark, d))
      .filter(col("k") % 100L === 0L)
      .select(col("k"), col("lat_u"), col("lon_u"))
      .as[(Long, Long, Long)]
      .map { case (k, latU, lonU) =>
        (k, math.round(GeoUtil.haversineKm(latU / 1000000.0, lonU / 1000000.0,
          48.8566, 2.3522) * 1e6) / 1e6)
      }
      .toDF("k", "km")
      .orderBy("k")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qgeo_cells" -> qgeoCells _,
    "qgeo_radius_join" -> qgeoRadiusJoin _,
    "qgeo_radius_capped" -> qgeoRadiusCapped _,
    "qgeo_haversine" -> qgeoHaversine _)

  private val CoordsSql =
    "SELECT CAST(c_custkey AS BIGINT) AS k, " +
      "(c_custkey * 7919) % 120000000 - 60000000 AS lat_u, " +
      "(c_custkey * 104729) % 360000000 - 180000000 AS lon_u FROM customer"

  val oracles: Map[String, String] = Map(
    "qgeo_cells" ->
      ("WITH pts AS (" + CoordsSql + "), q AS (" +
        "SELECT k, (lat_u + 60000000) * 128 // 120000000 AS lat_q, " +
        "(lon_u + 180000000) * 128 // 360000000 AS lon_q FROM pts) " +
        "SELECT CAST(list_sum(list_transform(range(0, 7), i -> " +
        "((lat_q // (1 << CAST(i AS INT))) % 2) * (1 << CAST(2*i AS INT)) + " +
        "((lon_q // (1 << CAST(i AS INT))) % 2) * (1 << CAST(2*i+1 AS INT)))) AS BIGINT) AS cell, " +
        "COUNT(*) AS n, MIN(k) AS min_k, MAX(k) AS max_k " +
        "FROM q GROUP BY 1 ORDER BY cell"),
    "qgeo_radius_join" ->
      ("WITH pts AS (" + CoordsSql + ") " +
        "SELECT a.k AS k, COUNT(*) AS n_near, CAST(SUM(b.k) AS BIGINT) AS near_sum " +
        "FROM pts a JOIN pts b ON a.k <> b.k " +
        "AND (a.lat_u - b.lat_u)*(a.lat_u - b.lat_u) + " +
        "(a.lon_u - b.lon_u)*(a.lon_u - b.lon_u) <= 64000000000000 " +
        "GROUP BY a.k ORDER BY k"),
    "qgeo_radius_capped" ->
      ("WITH pts AS (" + CoordsSql + "), " +
        "c AS (SELECT k, lat_u, lon_u, " +
        "(lon_u + 180000000) // 8000000 AS cx, " +
        "(lat_u + 60000000) // 8000000 AS cy FROM pts), " +
        "kept AS (SELECT k, lat_u, lon_u FROM (" +
        "SELECT k, lat_u, lon_u, " +
        "row_number() OVER (PARTITION BY cx, cy ORDER BY k) AS rn " +
        "FROM c) WHERE rn <= 8) " +
        "SELECT a.k AS k, COUNT(*) AS n_near, " +
        "CAST(SUM(b.k) AS BIGINT) AS near_sum " +
        "FROM kept a JOIN kept b ON a.k <> b.k " +
        "AND (a.lat_u - b.lat_u)*(a.lat_u - b.lat_u) + " +
        "(a.lon_u - b.lon_u)*(a.lon_u - b.lon_u) <= 64000000000000 " +
        "GROUP BY a.k ORDER BY k"),
    "qgeo_haversine" ->
      ("WITH pts AS (" + CoordsSql + ") " +
        "SELECT k, ROUND(2 * 6371.0088 * ASIN(SQRT(LEAST(1.0, " +
        "SIN(RADIANS(lat_u/1000000.0 - 48.8566) / 2) * " +
        "SIN(RADIANS(lat_u/1000000.0 - 48.8566) / 2) + " +
        "COS(RADIANS(48.8566)) * COS(RADIANS(lat_u/1000000.0)) * " +
        "SIN(RADIANS(lon_u/1000000.0 - 2.3522) / 2) * " +
        "SIN(RADIANS(lon_u/1000000.0 - 2.3522) / 2)))), 6) AS km " +
        "FROM pts WHERE k % 100 = 0 ORDER BY k"))
}
