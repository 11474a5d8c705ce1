package graft

import org.apache.spark.sql.functions.col

/** Dev aid: time embedding near-dup variants on a (scaled) SF dir — the
  * empirical side of the PERF.md round-4 scale-smoke finding that fixed
  * LSH bits go quadratic while occupancy-sized bits stay ~linear.
  *
  * Usage: sbt "Test/runMain graft.ScaleSmoke <sfDir> [minCos]"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("testdata-scaled/sf1x")
    val minCos = args.lift(1).map(_.toDouble).getOrElse(0.9)
    val spark = GraftSession.builder("graft-scale-smoke", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.sources.Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val n = e.count()
    val (tables, bits) = graft.operators.Similarity.lshGeometry(n, minCos, 0.999, 32)
    println(s"[smoke] n=$n minCos=$minCos -> tables=$tables bits=$bits")
    val t0 = System.nanoTime()
    val pairs = graft.operators.Similarity
      .nearDupPairsAuto(e, minCos)
      .count()
    println(f"[smoke] auto near-dup: $pairs pairs in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
