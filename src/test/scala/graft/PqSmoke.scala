package graft

import org.apache.spark.sql.functions.col
import graft.operators.Similarity
import graft.sources.Tables

/** Dev aid: time the PQ train/encode/search path on a (scaled) SF dir —
  * the 10× scale smoke for the memory-bound ANN family (PERF.md).
  *
  * Usage: sbt "Test/runMain graft.PqSmoke <sfDir>"
  */
object PqSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-pq-smoke", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val t0 = System.nanoTime()
    val model = Similarity.trainPq(e, m = 8, nbits = 4)
    val tTrain = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val n = Similarity.pqEncode(e, model).count()
    val tEnc = (System.nanoTime() - t1) / 1e9
    val q = e.filter(col("vec_id") < 5)
    val t2 = System.nanoTime()
    val hits = Similarity.pqTopK(e, q, k = 10, model, rerank = 4).count()
    val tSearch = (System.nanoTime() - t2) / 1e9
    println(f"[smoke] pq: n=$n train=$tTrain%.1f s encode=$tEnc%.1f s " +
      f"search=$tSearch%.1f s hits=$hits ($dir)")
    spark.stop()
  }
}
