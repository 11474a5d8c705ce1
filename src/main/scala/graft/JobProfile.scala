package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev tool: run one query-pack entry with a job listener and print
  * every Spark job's wall time + first-stage name — the §1 "where does
  * the time actually go" step for multi-job certification lifecycles,
  * where a single bench number hides 10-30 internal actions.
  *
  * Usage: `runMain graft.JobProfile <query> [sfDir]`.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <query> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession.builder("job-profile", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val what = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.headOption.map(_.name.linesIterator.next()))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), what.take(120)))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, what) =>
          lines.add((je.jobId, (System.nanoTime() - t0) / 1e9, what))
        }
      }
    })
    // warm-up at sf0.001 (JIT/codegen), then the timed run
    try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"warmup: ${e.getMessage}") }
    starts.clear(); lines.clear()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // let the listener drain
    import scala.jdk.CollectionConverters._
    val all = lines.asScala.toSeq.sortBy(_._1)
    println(f"== $name%s total ${total}%.2f s, ${all.size}%d jobs, " +
      f"job-sum ${all.map(_._2).sum}%.2f s ==")
    all.foreach { case (id, dt, what) => println(f"  job $id%3d ${dt}%6.3f s  $what%s") }
    spark.stop()
  }
}
