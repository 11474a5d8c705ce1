package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingQuantiles
import graft.streaming.StreamingQuantiles.{KeyedValue, KeyedValueTs}

class StreamingQuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("running quantiles are EXACT below sketch capacity, cross-batch, any arrival order") {
    val stream = MemoryStream[KeyedValue](spark)
    // k=400 » 200 values: the sketch never compacts, so it holds every
    // value and INCLUSIVE quantiles are the exact order statistics
    val q = StreamingQuantiles.quantilesPerKey(stream.toDF(), k = 400)
      .writeStream.format("memory").queryName("sq_exact").outputMode("update").start()
    try {
      // evens first, odds second: order across batches must not matter
      stream.addData((1 to 200).filter(_ % 2 == 0).map(v => KeyedValue("h1", v.toDouble)): _*)
      q.processAllAvailable()
      stream.addData((1 to 200).filter(_ % 2 == 1).map(v => KeyedValue("h1", v.toDouble)): _*)
      q.processAllAvailable()
      val latest = spark.table("sq_exact").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getLong(4), r.getLong(5)))
        .filter(_._1 == "h1").maxBy(_._6)
      // 1..200: inclusive p50 = 100, p95 = 190, p99 = 198, n exact
      assert(latest._2 == 100.0, s"p50: $latest")
      assert(latest._3 == 190.0, s"p95: $latest")
      assert(latest._4 == 198.0, s"p99: $latest")
      assert(latest._5 == 200L, s"n: $latest")
    } finally q.stop()
  }

  test("above capacity the stream-folded estimate stays inside the KLL rank bound") {
    val stream = MemoryStream[KeyedValue](spark)
    // default k=200 with 10k values: deep in the compacted regime
    val q = StreamingQuantiles.quantilesPerKey(stream.toDF())
      .writeStream.format("memory").queryName("sq_approx").outputMode("update").start()
    try {
      (0 until 4).foreach { b =>
        stream.addData((b * 2500 until (b + 1) * 2500).map(v => KeyedValue("k", v.toDouble)): _*)
        q.processAllAvailable()
      }
      val latest = spark.table("sq_approx").collect()
        .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(5)))
        .maxBy(_._5)
      assert(latest._4 == 10000L, s"KLL tracks n losslessly: $latest")
      // uniform 0..9999 ⇒ value error == rank error; published bound is
      // ±1.65% of rank at 99% confidence, ±3% is the qk_kll_quantiles
      // certification band
      assert(math.abs(latest._1 - 5000.0) <= 300.0, s"p50: $latest")
      assert(math.abs(latest._2 - 9500.0) <= 300.0, s"p95: $latest")
      assert(math.abs(latest._3 - 9900.0) <= 300.0, s"p99: $latest")
    } finally q.stop()
  }

  test("event-time TTL expires idle keys; active keys survive") {
    val stream = MemoryStream[KeyedValueTs](spark)
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val q = StreamingQuantiles.quantilesPerKey(
      stream.toDF().withWatermark("ts", "0 seconds"), stateTtlMs = 60000L)
      .writeStream.format("memory").queryName("sq_ttl").outputMode("update").start()
    try {
      stream.addData(KeyedValueTs("old", 5.0, ts(0)), KeyedValueTs("live", 1.0, ts(0)))
      q.processAllAvailable()
      // 10 minutes later: "live" gets traffic (TTL refresh), "old" is idle
      stream.addData(KeyedValueTs("live", 2.0, ts(10)))
      q.processAllAvailable()
      stream.addData(KeyedValueTs("live", 3.0, ts(11)))
      q.processAllAvailable()
      // after expiry, traffic to "old" starts a FRESH sketch: n restarts
      // at 1 and the quantiles reflect only the new value
      stream.addData(KeyedValueTs("old", 99.0, ts(12)))
      q.processAllAvailable()
      val rows = spark.table("sq_ttl").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(4), r.getLong(5)))
      // the restart row re-emits seq=1, so identify it by its value: a
      // FRESH sketch sees only 99.0 with n=1; surviving state would have
      // absorbed it into {5.0, 99.0} with n=2
      val oldRows = rows.filter(_._1 == "old")
      assert(oldRows.contains(("old", 99.0, 1L, 1L)),
        s"expired key must restart fresh: ${oldRows.toList}")
      assert(!oldRows.exists(_._3 >= 2L),
        s"old state must not survive expiry: ${oldRows.toList}")
      val liveLatest = rows.filter(_._1 == "live").maxBy(_._4)
      assert(liveLatest._3 == 3L, s"live key must keep accumulating: $liveLatest")
      assert(liveLatest._2 == 2.0, s"live p50 of {1,2,3}: $liveLatest")
    } finally q.stop()
  }
}
