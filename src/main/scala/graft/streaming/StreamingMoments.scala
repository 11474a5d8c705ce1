package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{CovBuffer, CovUtil}

/** Streaming vector moments: the [[graft.functions.CovAccumAgg]] blob
  * in keyed state — running mean / per-dim variance / covariance trace
  * per key, the live feed for embedding-drift monitoring ("is this
  * hour's encoder output collapsing?") and for incremental PCA
  * retraining decisions, continuous next to the batch
  * [[graft.operators.Similarity.pcaSummary]] one-pass train.
  *
  * State is one [[CovBuffer]] per key — 1 + d + d(d+1)/2 doubles,
  * ~17 KB at d = 64, HARD-bounded by the vector width forever (the
  * sketch-in-state family: distinct = theta, frequency = Misra-Gries,
  * quantiles = KLL, MOMENTS = CovBuffer). Absorb is O(d²) per arrival;
  * emission is a bounded per-key summary (n, per-dim mean/var for the
  * first `reportDims` dims, trace), never the matrix.
  *
  * Twin contract (StreamingMomentsSpec): moment sums are plain double
  * additions, so stream-folded state equals the batch
  * `cov_accum_agg` blob up to addition-order ulps — the spec asserts
  * ≤ 1e-9 relative on every emitted figure, and EXACT equality of `n`.
  * Key-population growth is TTL-bounded exactly as
  * [[StreamingQuantiles]].
  */
object StreamingMoments {

  case class KeyedVec(key: String, vec: Seq[Float])
  /** TTL-mode input shape: vectors with an event-time column. */
  case class KeyedVecTs(key: String, vec: Seq[Float], ts: java.sql.Timestamp)

  /** Latest row per key = current state: exact count, mean and
    * population variance of dims [0, reportDims), covariance trace. */
  case class MomentReport(key: String, n: Long, mean: Seq[Double],
                          variance: Seq[Double], trace: Double, seq: Long)

  /** Keyed state: the serialized moment buffer + emission counter.
    * (Public: the state encoder's generated code must reach it.) */
  case class MomentState(bytes: Array[Byte], seq: Long)

  private def report(key: String, buf: CovBuffer, reportDims: Int,
                     seq: Long): MomentReport = {
    val cov = CovUtil.covariance(buf)
    val n = buf.n.toDouble
    val k = math.min(reportDims, buf.d)
    MomentReport(key, buf.n,
      (0 until k).map(i => buf.sums(i) / n),
      (0 until k).map(i => cov(i)(i)),
      (0 until buf.d).map(i => cov(i)(i)).sum, seq)
  }

  /** Input: a streaming DataFrame with `key: string`,
    * `vec: array<float>` (+ `ts` under a watermark when
    * `stateTtlMs` > 0). */
  def momentsPerKey(events: DataFrame, d: Int, reportDims: Int = 4,
                    stateTtlMs: Long = 0L): Dataset[MomentReport] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(stateTtlMs <= 0 || events.columns.contains("ts"),
      "stateTtlMs > 0 needs a 'ts' event-time column with a watermark " +
        "(events.withWatermark(\"ts\", ...))")
    val tsCol = if (stateTtlMs > 0) col("ts") else lit(null).cast("timestamp")
    val keyed = events.select(col("key"), col("vec"), tsCol.as("ts"))
      .as[(String, Seq[Float], java.sql.Timestamp)]

    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState[MomentState, MomentReport](
        OutputMode.Update, timeout) {
        (key: String, rows: Iterator[(String, Seq[Float], java.sql.Timestamp)],
         state: GroupState[MomentState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val buf = state.getOption
              .map(s => CovUtil.fromBytes(s.bytes))
              .getOrElse(new CovBuffer(d))
            var maxTs = Long.MinValue
            rows.foreach { case (_, v, ts) =>
              if (ts != null && ts.getTime > maxTs) maxTs = ts.getTime
              buf.update(v.map(_.toDouble).toArray)
            }
            val seq = state.getOption.map(_.seq).getOrElse(0L) + 1
            state.update(MomentState(buf.toBytes, seq))
            if (stateTtlMs > 0)
              state.setTimeoutTimestamp(
                math.max(maxTs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            Iterator.single(report(key, buf, reportDims, seq))
          }
      }
  }
}
