package graft

/** Dev tool: print a physical-plan health summary for query-pack
  * entries — the round discipline's ".explain and iterate" step as a
  * one-liner. Counts exchanges and join strategies (a
  * BroadcastNestedLoop or CartesianProduct outside a 1-row scalar
  * attachment is a red flag, as is an exchange count far above the
  * query's join count) and prints every scan's ReadSchema so missing
  * column pruning is visible.
  *
  * Usage: `runMain graft.PlanAudit [sfDir] [query ...]` — no query
  * names means the whole pack.
  *
  * Caveat: this prints the INITIAL adaptive plan (nothing is executed),
  * so AQE's runtime join demotions aren't reflected and
  * WholeStageCodegen spans aren't annotated yet — treat the codegen
  * count as a lower bound and join counts as the static strategy.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = GraftSession.builder("plan-audit", cpus)
      .master(s"local[$cpus]").getOrCreate()
    for (n <- names) {
      val plan = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      def c(s: String) = plan.linesIterator.count(_.contains(s))
      println(s"=== $n ===")
      println(s"  exchanges: ${c("Exchange")}  bhj: ${c("BroadcastHashJoin")}  " +
        s"smj: ${c("SortMergeJoin")}  bnlj: ${c("BroadcastNestedLoop")}  " +
        s"cartesian: ${c("CartesianProduct")}  codegen: ${c("WholeStageCodegen")}")
      plan.linesIterator.filter(_.contains("ReadSchema")).foreach { s =>
        val i = s.indexOf("ReadSchema")
        println("  scan: " + s.substring(i).take(160))
      }
    }
    spark.stop()
  }
}
