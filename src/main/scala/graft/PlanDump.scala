package graft

/** Dev tool: write `.explain("formatted")` output for query-pack entries
  * to files — the optimization-round evidence trail under plans/r16/.
  *
  * Usage: `runMain graft.PlanDump <outDir> [sfDir] [query ...]` — no
  * query names means the whole pack. Each query's FORMATTED physical
  * plan lands in `<outDir>/<name>.txt`.
  *
  * Note: building a lifecycle row's DataFrame (qw_*) EXECUTES its
  * fixture lifecycle eagerly; the dumped plan is the plan of the
  * RETURNED frame (the certified read), which for digest rows is tiny —
  * for those the interesting plans are the operator's internal reads,
  * which PlanAudit summarizes instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <outDir> [sfDir] [query ...]")
    val outDir = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    new java.io.File(outDir).mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession.builder("plan-dump", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$n.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] wrote $outDir/$n.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
