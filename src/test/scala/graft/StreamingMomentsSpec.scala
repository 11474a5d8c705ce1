package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.functions.{CovUtil, GraftFunctions}
import graft.streaming.StreamingMoments
import graft.streaming.StreamingMoments.{KeyedVec, KeyedVecTs}

class StreamingMomentsSpec extends SparkSpec {
  import spark.implicits._

  private def planted(i: Int): Seq[Float] = {
    val u = (i % 17).toFloat / 8f - 1f
    Seq(3f * u, u * u, (i % 5).toFloat, 0.5f)
  }

  test("stream-folded moments equal the batch cov_accum_agg blob (twin, ulp tolerance)") {
    GraftFunctions.ensureRegistered(spark)
    val stream = MemoryStream[KeyedVec](spark)
    val q = StreamingMoments.momentsPerKey(stream.toDF(), d = 4)
      .writeStream.format("memory").queryName("sm_twin").outputMode("update").start()
    try {
      // three micro-batches, same rows the batch aggregate sees at once
      (0 until 3).foreach { b =>
        stream.addData((b * 40 until (b + 1) * 40).map(i => KeyedVec("k", planted(i))): _*)
        q.processAllAvailable()
      }
      val latest = spark.table("sm_twin").collect()
        .map(r => (r.getLong(1), r.getSeq[Double](2), r.getSeq[Double](3),
          r.getDouble(4), r.getLong(5))).maxBy(_._5)
      val batchBlob = (0 until 120).map(i => Tuple1(planted(i)))
        .toDF("vec")
        .agg(org.apache.spark.sql.functions.expr("cov_accum_agg(vec, 4)"))
        .head().getAs[Array[Byte]](0)
      val buf = CovUtil.fromBytes(batchBlob)
      val cov = CovUtil.covariance(buf)
      assert(latest._1 == 120L && buf.n == 120L, "n must be EXACT both ways")
      val trace = (0 until 4).map(i => cov(i)(i)).sum
      assert(math.abs(latest._4 - trace) <= 1e-9 * math.max(math.abs(trace), 1.0),
        s"trace: stream ${latest._4} vs batch $trace")
      (0 until 4).foreach { i =>
        val bm = buf.sums(i) / 120.0
        assert(math.abs(latest._2(i) - bm) <= 1e-9 * math.max(math.abs(bm), 1.0),
          s"mean[$i]: ${latest._2(i)} vs $bm")
        assert(math.abs(latest._3(i) - cov(i)(i)) <= 1e-9 * math.max(cov(i)(i), 1.0),
          s"var[$i]: ${latest._3(i)} vs ${cov(i)(i)}")
      }
      // a constant dim must read exactly zero variance, not ulp noise
      assert(latest._3(3) == 0.0, s"constant dim variance: ${latest._3}")
    } finally q.stop()
  }

  test("keys accumulate independently; event-time TTL restarts idle keys fresh") {
    val stream = MemoryStream[KeyedVecTs](spark)
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val q = StreamingMoments.momentsPerKey(
      stream.toDF().withWatermark("ts", "0 seconds"), d = 4, stateTtlMs = 60000L)
      .writeStream.format("memory").queryName("sm_ttl").outputMode("update").start()
    try {
      stream.addData(KeyedVecTs("old", planted(1), ts(0)),
        KeyedVecTs("live", planted(2), ts(0)))
      q.processAllAvailable()
      stream.addData(KeyedVecTs("live", planted(3), ts(10)))
      q.processAllAvailable()
      stream.addData(KeyedVecTs("live", planted(4), ts(11)))
      q.processAllAvailable()
      stream.addData(KeyedVecTs("old", planted(9), ts(12)))
      q.processAllAvailable()
      val rows = spark.table("sm_ttl").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(5)))
      // expired "old" restarts: its post-expiry emission has n=1 again,
      // and no "old" emission ever reached n=2
      assert(rows.count(t => t._1 == "old" && t._2 == 1L && t._3 == 1L) == 2,
        rows.toList.toString)
      assert(!rows.exists(t => t._1 == "old" && t._2 >= 2L), rows.toList.toString)
      assert(rows.filter(_._1 == "live").map(_._2).max == 3L, rows.toList.toString)
    } finally q.stop()
  }
}
