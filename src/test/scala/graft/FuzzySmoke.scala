package graft

import org.apache.spark.sql.functions._

/** Dev aid: 10× scale smoke for [[graft.operators.Dedup.fuzzyJoinLev]]
  * with NAME-DISJOINT copies — run once, not in CI.
  *
  * The generic ScaleUp amplification shifts keys per copy but leaves
  * customer NAMES near-identical across copies ("Customer#1000000001"
  * vs "Customer#2000000001" is edit distance 1), so for a name-keyed
  * operator every row gains one distance-1 neighbor per copy and the
  * OUTPUT grows copies² — a data artifact, not a plan failure. This
  * smoke doubles the copy marker ("C00ustomer…", "C11ustomer…": two
  * differing positions, distance 2 > k=1) so copy universes are
  * genuinely disjoint for edit distance 1 and the honest scaling is
  * visible: 10× input → 10× output.
  *
  * Usage: sbt "Test/runMain graft.FuzzySmoke <sfDir> [copies]"
  */
object FuzzySmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = GraftSession.builder("graft-fuzzy-smoke", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.sources.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"))
    val amplified = (0 until copies).map { i =>
      base.select(
        (col("c_custkey") + lit(i * 1000000000L)).as("c_custkey"),
        concat(lit(s"C$i$i"), expr("substring(c_name, 2)")).as("c_name"))
    }.reduce(_ unionByName _)
    for (df <- Seq(("1x", base), (s"${copies}x", amplified))) {
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.fuzzyJoinLev(df._2, "c_custkey", "c_name", 1).count()
      println(f"[smoke] fuzzy ${df._1}: $n pairs in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
