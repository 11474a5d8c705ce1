package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line the driver compares against BASELINE.md.
  *
  * Materialization is a `noop`-format write — unlike `.count()`, which lets
  * Catalyst prune sorts/projections out of the plan, noop executes the full
  * physical plan (every shuffle, sort and expression) without sink cost.
  *
  * Steady-state methodology (VERDICT r7 task 3): one warm-up pass at a tiny
  * SF absorbs JIT/codegen, then the pack runs SPARK_GRAFT_REPS (default 2)
  * timed repetitions and each query reports its MIN — first-execution
  * compilation and same-JVM GC churn inflated three rounds of in-pack
  * numbers that hand re-runs kept adjudicating back to the envelope; MIN
  * over two reps is that envelope, measured instead of argued.
  *
  * Output contract (VERDICT r7 task 8): the driver captures only the LAST
  * ~2000 chars of stdout, so a full 123-entry per-query map (~3.3 KB) gets
  * head-truncated into unparseable JSON. The FULL result always lands in
  * `bench_out.json` (and stderr); the final stdout line keeps the same
  * shape but caps the `queries` map at a byte budget, filling with the
  * most expensive queries first (the ones worth reading) and reporting
  * how many cheap ones were elided (`queries_omitted`).
  */
object Bench {

  /** Per-query isolation (round 9): drop every cached block the previous
    * query left behind — `persist`ed plans via the catalog, plus
    * RDD-level state (`localCheckpoint` materializes through the same
    * BlockManager) via the SparkContext registry. Without this, 132
    * queries × reps accumulate storage until late-pack queries run under
    * GC/eviction pressure that has nothing to do with their own plans:
    * at the 10× tier, qd_containment measured 42.5 s in-pack vs 6.4 s
    * quiet-targeted (3-rep MIN) before this hook, 2.0× scaling after.
    * Runs BETWEEN queries (outside the timed window), so each query
    * still pays the full cost of every persist it performs itself. */
  private def dropCachedState(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    // Deliberately NO System.gc() here: measured at the 10× tier, a
    // forced full GC per query cost more than the cleaner backlog it
    // retired (pack 187 s → 204 s, qd_dup_clusters 11.3 s → 20.5 s).
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt.max(1)
    // optional comma-separated query-name filter (dev loop + scale smokes;
    // the driver's full run leaves it unset)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd name must fail loudly, not silently bench nothing
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.mkString(", ")}")
    }
    val pack = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.view.filterKeys(names).toMap)
    val spark = GraftSession.builder("graft-bench", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up at a small SF: same plan structure → codegen cache primed
    // cheaply. Failures are logged, not swallowed: a missing warm-up dir
    // would silently shift JIT cost into the first measured queries.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    pack.foreach { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}")
      }
      dropCachedState(spark)
    }

    // Timed loop, `reps` passes, per-query MIN over SUCCESSFUL reps only.
    // A crashed query must NOT masquerade as a fast one: a crash's elapsed
    // time never folds into the min (a 0.1 s plan-time failure is not a
    // completed execution), it is used only as a fallback when NO rep
    // succeeded. A query that failed in ANY rep keeps its error and the
    // run exits nonzero.
    val names = pack.keys.toSeq.sorted
    val succTimes = collection.mutable.Map[String, Double]()
    val crashTimes = collection.mutable.Map[String, Double]()
    val errors = collection.mutable.Map[String, String]()
    for (rep <- 1 to reps; name <- names) {
      val fn = pack(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        succTimes(name) = succTimes.get(name).fold(dt)(math.min(_, dt))
      } catch { case e: Throwable =>
        errors(name) = e.toString.takeWhile(_ != '\n').take(160)
        crashTimes.getOrElseUpdate(name, (System.nanoTime() - t0) / 1e9)
      }
      dropCachedState(spark) // outside the timed window
    }
    val results = names.map(n =>
      (n, succTimes.getOrElse(n, crashTimes(n)), errors.get(n)))

    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def qmap(rs: Seq[(String, Double, Option[String])]) =
      rs.map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    def render(rs: Seq[(String, Double, Option[String])], omitted: Int) =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n":${results.size},"reps":$reps,"queries_omitted":$omitted,"queries":${qmap(rs)},"errors":$errs,"sf":"$sfDir"}"""

    // Durable full copy first (env-overridable path), then stderr.
    val fullJson = render(results, 0)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (fullJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    System.err.println(fullJson)

    // Final stdout line: greedily keep the most expensive queries until
    // the rendered line fits the driver's tail window, then restore name
    // order. Deterministic given the timings; heaviest queries — the ones
    // a plan audit reads — always survive.
    val budget = sys.env.getOrElse("SPARK_GRAFT_STDOUT_BUDGET", "1750").toInt
    val byCost = results.sortBy(-_._2)
    var keep = byCost.length
    while (keep > 0 && render(byCost.take(keep).sortBy(_._1), results.size - keep).length > budget)
      keep -= 1
    val stdoutJson = render(byCost.take(keep).sortBy(_._1), results.size - keep)

    spark.stop()
    // printed LAST, after Spark shutdown, so nothing else can push it out
    // of the tail capture
    println(stdoutJson)
    if (errors.nonEmpty) sys.exit(1)
  }
}
