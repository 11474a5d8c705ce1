package graft

/** Dev aid: time substring-level dedup on a (scaled) SF dir — the 10×
  * scale smoke for `duplicatedSpans` (PERF.md). Run once, not in CI.
  *
  * Usage: sbt "Test/runMain graft.SpanSmoke <sfDir>"
  */
object SpanSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-span-smoke", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = graft.operators.Dedup.qtSubstringDup(spark, dir).count()
    println(f"[smoke] duplicated spans: $n rows in ${(System.nanoTime() - t0) / 1e9}%.1f s ($dir)")
    spark.stop()
  }
}
