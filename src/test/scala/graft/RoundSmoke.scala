package graft

/** Dev aid: time this round's new declared queries on a (scaled) SF dir —
  * the 10× scale smoke for PERF.md. Run once, not in CI.
  *
  * Usage: sbt "Test/runMain graft.RoundSmoke <sfDir> [name,name,...]"
  */
object RoundSmoke {
  private val DefaultNames = Seq(
    "qe_interval_join", "qw_merge_upsert", "qp_weighted_sample",
    "qt_normalize", "qs_semantic_dedup", "q44_ntile", "qs_hard_negatives")

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(DefaultNames)
    val spark = GraftSession.builder("graft-round-smoke", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val q = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      println(f"[smoke] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s ($dir)")
    }
    spark.stop()
  }
}
