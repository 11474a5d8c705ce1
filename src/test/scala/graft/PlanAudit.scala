package graft

/** Dev aid: dump executed-plan summaries for the scale-critical queries
  * so plan regressions (lost pushdown, surprise nested-loop join,
  * single-partition window) are visible at a glance. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    val d = "/root/testdata/sf0.01"
    if (args.headOption.contains("all")) { sweep(spark, d); return }
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

  /** Whole-pack static audit: plan every declared query and flag
    * CartesianProduct (always a bug here) and BroadcastNestedLoopJoin
    * (legitimate ONLY as a 1-row scalar attachment — each hit printed
    * for hand adjudication). */
  private def sweep(spark: org.apache.spark.sql.SparkSession, d: String): Unit = {
    var cart = 0; var bnlj = 0; var failed = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, d).queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct")) { cart += 1; println(s"[CARTESIAN] $name") }
        val n = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
        if (n > 0) { bnlj += n; println(s"[BNLJ x$n] $name") }
      } catch { case e: Throwable =>
        failed += 1; println(s"[PLAN-FAIL] $name: ${e.getMessage.takeWhile(_ != '\n')}")
      }
    }
    println(s"[audit] queries=${SparkEntry.queries.size} cartesians=$cart " +
      s"bnlj_sites=$bnlj plan_failures=$failed")
  }
}
