package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line the driver compares against BASELINE.md.
  *
  * Materialization is a `noop`-format write — unlike `.count()`, which lets
  * Catalyst prune sorts/projections out of the plan, noop executes the full
  * physical plan (every shuffle, sort and expression) without sink cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
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

    // One warm-up pass over a small SF absorbs JIT + codegen cost so the
    // measured numbers reflect steady-state throughput, as on a warm
    // cluster. Warm-up failures are logged (not swallowed silently): a
    // missing warm-up dir would otherwise shift JIT cost into the first
    // measured queries.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    pack.foreach { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}")
      }
    }

    // Timed loop: a crashed query must NOT masquerade as a fast one — its
    // error is recorded per query and the whole run exits nonzero.
    val results = pack.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None
      } catch { case e: Throwable => Some(e.toString.takeWhile(_ != '\n').take(160)) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = results.map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(json)
    // The stdout line travels through sbt's [info] prefixing and whatever
    // else shares the log — one bad line and the signal is gone. Persist
    // the same JSON to a file as the durable copy (env-overridable path).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
