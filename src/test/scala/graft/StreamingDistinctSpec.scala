package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDistinct
import graft.streaming.StreamingDistinct.{KeyedEvent, KeyedEventTs}

class StreamingDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("running distinct is EXACT below sketch capacity, cross-batch and duplicate-proof") {
    val stream = MemoryStream[KeyedEvent](spark)
    val q = StreamingDistinct.distinctPerKey(stream.toDF())
      .writeStream.format("memory").queryName("sd_exact").outputMode("update").start()
    try {
      stream.addData((0L until 500L).map(v => KeyedEvent("h1", v)): _*)
      q.processAllAvailable()
      stream.addData( // 250 repeats + 250 novel for h1; a fresh key h2
        ((250L until 750L).map(v => KeyedEvent("h1", v)) ++
          (0L until 100L).map(v => KeyedEvent("h2", v))): _*)
      q.processAllAvailable()
      val latest = spark.table("sd_exact").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.maxBy(_._3)._2).toMap
      // θ = 1 regime: the sketch IS the exact distinct count
      assert(latest("h1") == 750.0, s"h1: ${latest("h1")}")
      assert(latest("h2") == 100.0, s"h2: ${latest("h2")}")
    } finally q.stop()
  }

  test("streaming estimate == batch theta sketch == bounded vs exact, above capacity") {
    val stream = MemoryStream[KeyedEvent](spark)
    // lgK 8 → 256 nominal entries; 20k distinct forces the sampling regime
    val q = StreamingDistinct.distinctPerKey(stream.toDF(), lgK = 8)
      .writeStream.format("memory").queryName("sd_approx").outputMode("update").start()
    try {
      (0 until 4).foreach { b =>
        stream.addData((b * 5000L until (b + 1) * 5000L).map(v => KeyedEvent("k", v)): _*)
        q.processAllAvailable()
      }
      val est = spark.table("sd_approx").collect()
        .map(r => (r.getDouble(1), r.getLong(2))).maxBy(_._2)._1
      // lgK=8 ⇒ ~6.25% standard error; 20% is > 3 sigma
      assert(math.abs(est - 20000.0) / 20000.0 < 0.20, s"estimate $est vs 20000")
      // determinism: folding batch-by-batch through state must land on
      // the same sketch a single direct pass builds (set-function)
      val direct = {
        val u = org.apache.datasketches.theta.SetOperation.builder()
          .setLogNominalEntries(8).buildUnion()
        (0L until 20000L).foreach(v => u.update(v))
        u.getResult.getEstimate
      }
      assert(est == direct, "stream-folded sketch must equal the directly built one")
    } finally q.stop()
  }

  test("event-time TTL expires idle keys; active keys survive") {
    val stream = MemoryStream[KeyedEventTs](spark)
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val q = StreamingDistinct.distinctPerKey(
      stream.toDF().withWatermark("ts", "0 seconds"), stateTtlMs = 60000L)
      .writeStream.format("memory").queryName("sd_ttl").outputMode("update").start()
    try {
      stream.addData(KeyedEventTs("old", 1L, ts(0)), KeyedEventTs("live", 1L, ts(0)))
      q.processAllAvailable()
      // 10 minutes later: "live" gets traffic (TTL refresh), "old" is idle
      stream.addData(KeyedEventTs("live", 2L, ts(10)))
      q.processAllAvailable()
      stream.addData(KeyedEventTs("live", 3L, ts(11)))
      q.processAllAvailable()
      // after expiry, traffic to "old" starts a FRESH sketch: the count
      // restarts at 1 (old state removed), while "live" kept accumulating
      stream.addData(KeyedEventTs("old", 99L, ts(12)))
      q.processAllAvailable()
      val rows = spark.table("sd_ttl").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      val oldLatest = rows.filter(_._1 == "old").maxBy(_._3)
      assert(oldLatest._2 == 1.0, s"expired key must restart: $oldLatest")
      assert(oldLatest._3 == 1L, s"expired key must restart its seq: $oldLatest")
      assert(rows.filter(_._1 == "live").maxBy(_._3)._2 == 3.0)
    } finally q.stop()
  }
}
