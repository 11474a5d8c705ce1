package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming radius search: the online twin of
  * [[graft.operators.Geo.qgeoRadiusJoin]] — each arriving point is
  * matched against the points ALREADY SEEN on the stream that lie
  * within `radiusMicro` (planar, exact integer µdeg — the same
  * arithmetic as the batch row, so the twins agree bit-for-bit).
  *
  * Same keyed-state architecture as [[StreamingSimilarity]], with the
  * grid playing the LSH-bucket role — but the 2-D neighborhood needs
  * one inversion: per-key state cannot be probed across keys, so each
  * point REPLICATES into all 9 cells of its 3×3 neighborhood as a
  * RESIDENT, and PROBES only its own cell. An arrival keyed at cell(p)
  * then sees exactly the prior points q with |cell(q)−cell(p)| ≤ 1 on
  * both axes — the complete candidate set — and every (new, seen) pair
  * is found exactly once (only the new point's own cell probes).
  * Constant 9× state replication buys single-key probes; work per
  * arrival is bounded by local density, never by history size.
  *
  * State bounds mirror the family: `maxPerCell` FIFO depth per cell;
  * cell-key COUNT is bounded only with `stateTtlMs` > 0 (event-time
  * TTL over a watermarked `ts` column) — without it, keys grow with
  * the covered area over an infinite stream. */
object StreamingGeo {

  case class GeoNeighbor(point_id: Long, neighbor_id: Long, dist2: Long)

  /** Cell-state entry (public for the state encoder's generated code). */
  case class PointResident(id: Long, latU: Long, lonU: Long)

  def neighborsSeen(points: DataFrame, radiusMicro: Long,
                    maxPerCell: Int = 256,
                    stateTtlMs: Long = 0L): Dataset[GeoNeighbor] = {
    require(radiusMicro > 0, "geo: radius must be positive")
    val spark = points.sparkSession
    import spark.implicits._
    require(stateTtlMs <= 0 || points.columns.contains("ts"),
      "stateTtlMs > 0 needs a watermarked 'ts' event-time column")
    val tsCol = if (stateTtlMs > 0) col("ts") else lit(null).cast("timestamp")
    // shift to non-negative before the integer divide so the cell id is
    // a true floor on both sides of the meridian/equator
    val offsets = Seq(-1L, 0L, 1L)
      .flatMap(dx => Seq(-1L, 0L, 1L).map(dy => (dx, dy)))
    val replicated = points
      .select(col("point_id"), col("lat_u"), col("lon_u"), tsCol.as("ts"))
      .withColumn("cx", expr(s"(lon_u + 180000000) div $radiusMicro"))
      .withColumn("cy", expr(s"(lat_u + 60000000) div $radiusMicro"))
      .crossJoin(spark.createDataFrame(offsets).toDF("dx", "dy"))
      .select(col("point_id"), col("lat_u"), col("lon_u"),
        concat_ws(":", col("cx") + col("dx"), col("cy") + col("dy")).as("cell"),
        (col("dx") === 0L && col("dy") === 0L).as("probe"), col("ts"))
      .as[(Long, Long, Long, String, Boolean, java.sql.Timestamp)]

    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    replicated
      .groupByKey(_._4)
      .flatMapGroupsWithState[List[PointResident], GeoNeighbor](
        OutputMode.Update, timeout) {
        (_: String,
         rows: Iterator[(Long, Long, Long, String, Boolean, java.sql.Timestamp)],
         state: GroupState[List[PointResident]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var residents = state.getOption.getOrElse(Nil)
            var maxTs = Long.MinValue
            val r2 = radiusMicro * radiusMicro
            val hits = scala.collection.mutable.ListBuffer[GeoNeighbor]()
            rows.foreach { case (id, latU, lonU, _, probe, ts) =>
              if (ts != null && ts.getTime > maxTs) maxTs = ts.getTime
              if (probe) residents.foreach { res =>
                val dla = latU - res.latU
                val dlo = lonU - res.lonU
                val d2 = dla * dla + dlo * dlo
                if (d2 <= r2 && res.id != id)
                  hits += GeoNeighbor(id, res.id, d2)
              }
              residents =
                (PointResident(id, latU, lonU) :: residents).take(maxPerCell)
            }
            state.update(residents)
            if (stateTtlMs > 0)
              state.setTimeoutTimestamp(
                math.max(maxTs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            hits.iterator
          }
      }
  }
}
