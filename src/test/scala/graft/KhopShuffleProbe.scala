package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions.col
import graft.operators.Graph
import graft.sources.Tables

/** Scratch probe: shuffle bytes of kHopDistances with and without the
  * bloom-refined reached-set (dev aid for the PERF.md scale table —
  * the claim under test is that the anti-join leg's shuffle shrinks
  * when bloom-negative candidates bypass it). */
object KhopShuffleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shuffleWrite = new AtomicLong()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    // Simulate the regime the refinement exists for: a reached set too
    // big to broadcast (at 100 TB `reached` dwarfs any broadcast
    // threshold; at probe scale we disable auto-broadcast to get the
    // same sort-merge anti-join plan). Denser 15k-node graph than
    // qg_khop's so frontiers genuinely expand.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def run(refine: Boolean): (Long, Double, Long) = {
      val edges = Tables.orders(spark, sf)
        .select(col("o_custkey").as("src"),
          ((col("o_orderkey") * 7) % 150000 + 1).as("dst"))
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct()
      val seeds = nodes.filter(col("node") % 100 === 1)
      shuffleWrite.set(0L)
      val t0 = System.nanoTime()
      val n = Graph.kHopDistances(edges, seeds, 4, bloomRefine = refine).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // let the listener bus drain stage events
      (shuffleWrite.get(), dt, n)
    }
    try {
      // warm-up then two measured passes each, interleaved
      run(refine = false); run(refine = true)
      for (rep <- 1 to 2; refine <- Seq(false, true)) {
        val (bytes, dt, n) = run(refine)
        println(f"PROBE rep=$rep refine=$refine rows=$n shuffleMB=${bytes / 1e6}%.1f time=$dt%.1fs")
      }
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
