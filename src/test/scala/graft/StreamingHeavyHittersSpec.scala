package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingHeavyHitters
import graft.streaming.StreamingHeavyHitters.TokenEvent

class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("hot tokens surface across batches with MG error bounds; state stays capped") {
    // 2 hot tokens among a long cold tail, split over 3 batches
    val hot = Seq.fill(500)(TokenEvent("hot_alpha")) ++ Seq.fill(300)(TokenEvent("hot_beta"))
    val cold = (0 until 400).map(i => TokenEvent(s"cold_$i"))
    val all = new scala.util.Random(7).shuffle(hot ++ cold)
    val batches = all.grouped((all.size + 2) / 3).toSeq

    val stream = MemoryStream[TokenEvent](spark)
    val shards = 4; val capacity = 64
    val q = StreamingHeavyHitters.topTokens(stream.toDF(), shards, capacity)
      .writeStream.format("memory").queryName("hitters").outputMode("update").start()
    val (latest, stateRows) = try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      // update mode appends one row per (shard flush); keep the LAST
      // estimate per token
      val rows = spark.table("hitters").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val last = rows.zipWithIndex
        .groupBy(_._1._1).map { case (t, rs) => t -> rs.maxBy(_._2)._1 }
      val progress = q.recentProgress.reverse.find(_.stateOperators.nonEmpty).get
      (last, progress.stateOperators.map(_.numRowsTotal).sum)
    } finally q.stop()

    // MG guarantee per token: est <= true <= est + err
    val (_, estA, errA) = latest("hot_alpha")
    val (_, estB, errB) = latest("hot_beta")
    assert(estA <= 500 && 500 <= estA + errA, s"alpha bound broken: $estA +$errA")
    assert(estB <= 300 && 300 <= estB + errB, s"beta bound broken: $estB +$errB")
    // the two hot tokens dominate every cold estimate
    val topByEst = latest.values.toSeq.sortBy(-_._2).take(2).map(_._1).toSet
    assert(topByEst == Set("hot_alpha", "hot_beta"), s"top-2 wrong: $topByEst")
    // hard state bound: shard state rows never exceed the shard count
    // (each shard's whole MG table is ONE state row)
    assert(stateRows <= shards, s"state rows $stateRows exceed shard count $shards")
  }

  test("streaming estimates agree with batch exact counts when capacity covers the vocabulary") {
    val toks = Seq.fill(40)(TokenEvent("x")) ++ Seq.fill(25)(TokenEvent("y")) ++
      Seq.fill(10)(TokenEvent("z"))
    val stream = MemoryStream[TokenEvent](spark)
    val q = StreamingHeavyHitters.topTokens(stream.toDF(), shards = 2, capacity = 16)
      .writeStream.format("memory").queryName("hitters_exact").outputMode("update").start()
    val latest = try {
      stream.addData(new scala.util.Random(3).shuffle(toks)); q.processAllAvailable()
      spark.table("hitters_exact").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (t, rs) => t -> rs.last }
    } finally q.stop()
    // capacity ≥ distinct tokens per shard ⇒ zero decrements ⇒ exact
    assert(latest("x") == (("x", 40L, 0L)))
    assert(latest("y") == (("y", 25L, 0L)))
    assert(latest("z") == (("z", 10L, 0L)))
  }

  test("currentTopK bounds hold even for tokens evicted AFTER their last emission") {
    // capacity 2, one shard. Batch 1 tracks T and U exactly. Batch 2's
    // 20-token flood first decrements both out (9 decrements), then X/Y
    // occupy the table — T's seq-1 row (est 5, err 0) is now stale.
    // Batch 3 sends 3 MORE T's; the full table turns them into
    // decrements, so T's true count is 8 with no newer T row. The
    // consolidated err must come from the shard's CURRENT decrement
    // count (8), not the stale row's 0 — else the reported interval
    // [5, 5] excludes the true count.
    val stream = MemoryStream[TokenEvent](spark)
    val q = StreamingHeavyHitters.topTokens(stream.toDF(), shards = 1, capacity = 2)
      .writeStream.format("memory").queryName("hitters_evict").outputMode("update").start()
    val rows = try {
      stream.addData(Seq.fill(5)(TokenEvent("T")) ++ Seq.fill(4)(TokenEvent("U")))
      q.processAllAvailable()
      stream.addData(new scala.util.Random(11).shuffle(
        Seq.fill(10)(TokenEvent("X")) ++ Seq.fill(10)(TokenEvent("Y"))))
      q.processAllAvailable()
      stream.addData(Seq.fill(3)(TokenEvent("T")))
      q.processAllAvailable()
      StreamingHeavyHitters.currentTopK(spark.table("hitters_evict"), 10)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    } finally q.stop()
    val truth = Map("T" -> 8L, "U" -> 4L, "X" -> 10L, "Y" -> 10L)
    rows.foreach { case (tok, (est, err)) =>
      val t = truth(tok)
      assert(est <= t && t <= est + err,
        s"$tok: true $t outside reported [$est, ${est + err}]")
    }
    // the stale-T scenario really occurred: T's latest row predates the
    // flood, yet its bound covers the 3 post-eviction arrivals
    val (estT, errT) = rows("T")
    assert(estT == 5L && errT >= 8L, s"expected stale T(5) widened by shard dec>=8, got ($estT, $errT)")
  }

  test("currentTopK over the sink == batch qtVocab top-k when capacity covers the vocabulary") {
    import org.apache.spark.sql.functions.{col, explode, split}
    // stream the real documents' tokens (multi-batch so per-token rows
    // accumulate across flushes and 'latest' actually has to pick)
    val toks = graft.sources.Tables.documents(spark, sfTiny)
      .select(explode(split(col("text"), " ")).as("t")).as[String]
      .collect().map(TokenEvent.apply)
    val stream = MemoryStream[TokenEvent](spark)
    val q = StreamingHeavyHitters.topTokens(stream.toDF(), shards = 4, capacity = 4096)
      .writeStream.format("memory").queryName("hitters_vocab").outputMode("update").start()
    val got = try {
      toks.grouped((toks.length + 2) / 3)
        .foreach { b => stream.addData(b.toSeq); q.processAllAvailable() }
      StreamingHeavyHitters.currentTopK(spark.table("hitters_vocab"), 20)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    } finally q.stop()
    val want = graft.operators.TextAnalysis.qtVocab(spark, sfTiny)
      .collect().map(r => (r.getString(0), r.getLong(1), 0L)).toSeq
    assert(got == want, s"streaming consolidation diverged from batch vocab:\n$got\nvs\n$want")
  }
}
