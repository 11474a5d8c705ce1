package graft

/** Dev aid: dump executed-plan summaries for the scale-critical queries
  * so plan regressions (lost pushdown, surprise nested-loop join,
  * single-partition window) are visible at a glance. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    val d = "/root/testdata/sf0.01"
    val interesting = Seq("q6_multi_join", "q8_topk_per_group", "q9_running_sum",
      "q21_rank_lag_lead", "qs_cosine_topk", "qd_ngram_jaccard",
      "qd_minhash_lsh", "qd_simhash", "qt_fingerprint", "q20_limit")
    interesting.foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      println(s"\n===== $name =====")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .map(_.takeWhile(_ != '[')).mkString("\n"))
    }
  }
}
