package graft

import org.apache.spark.sql.functions._
import graft.operators.Ingest

/** The two-batch incremental-ingest composite (qp_ingest): funnel
  * invariants, the two-tier bloom probe's exactness, and the plan shape.
  * The hash-exact cross-engine check is the driver's CORRECTNESS row. */
class IngestSpec extends SparkSpec {

  private lazy val funnel: Map[String, Long] =
    Ingest.qpIngest(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("funnel is monotone and internally consistent") {
    // every stage present
    val stages = Set("b1_corrupt", "b1_clean", "b2_corrupt", "b2_clean",
      "b2_new", "b2_dedup_keepers", "b2_train", "b2_val", "b2_test")
    assert(funnel.keySet == stages, s"got ${funnel.keySet}")
    // quarantine loses nothing: corrupt + clean partitions each batch
    assert(funnel("b1_corrupt") > 0 && funnel("b2_corrupt") > 0,
      "the %7 corruption rule must hit both batches")
    // monotone funnel
    assert(funnel("b2_new") <= funnel("b2_clean"))
    assert(funnel("b2_dedup_keepers") <= funnel("b2_new"))
    assert(funnel("b2_train") + funnel("b2_val") + funnel("b2_test") ==
      funnel("b2_dedup_keepers"), "split must partition the keepers")
    // the injected duplicates give every stage real work
    assert(funnel("b2_new") < funnel("b2_clean"),
      "cross-batch injected dups must be dropped by the seen-filter tier")
    assert(funnel("b2_dedup_keepers") < funnel("b2_new"),
      "in-batch injected dups must be folded by the dedup stage")
  }

  test("two-tier bloom probe == plain exact anti-join (the composition contract)") {
    import spark.implicits._
    // keys 0..999 seen; probe 500..1499 — 500 genuinely new
    val seenKeys = (0L until 1000L).map(i => s"key$i").toDF("k")
    val probe = (500L until 1500L).map(i => s"key$i").toDF("k")
    val filter = graft.operators.Sketches.buildSeenFilter(
      seenKeys, "k", expectedItems = 1000L, numBits = 20000L)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val maybe = call_function("seen_might_contain", lit(filter), xxhash64(col("k")))
    val definite = probe.filter(!maybe)
    val confirmed = probe.filter(maybe).join(seenKeys, Seq("k"), "left_anti")
    val twoTier = definite.unionByName(confirmed).collect().map(_.getString(0)).toSet
    val exact = probe.join(seenKeys, Seq("k"), "left_anti")
      .collect().map(_.getString(0)).toSet
    assert(twoTier == exact,
      "false positives may move rows between tiers, never across the result")
    assert(exact == (1000L until 1500L).map(i => s"key$i").toSet)
    // and the exact tier really is a sliver: the definite fast path
    // carried most of the new keys past the join
    val definiteCount = definite.count()
    assert(definiteCount > 400, s"fast path too small: $definiteCount of 500")
  }

  test("qp_ingest plans no cartesian join and probes the filter join-free") {
    val plan = Ingest.qpIngest(spark, sfTiny).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"composite degraded to all-pairs:\n$plan")
    assert(plan.contains("might_contain"),
      "the stored seen-filter must appear as an in-predicate probe")
  }

  test("fileProvenanceStats: per-file contiguous row_index on a multi-file table") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-prov").toString
    (1L to 100L).map(i => (i, s"doc$i")).toDF("id", "t")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val stats = graft.operators.Ingest.fileProvenanceStats(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(stats.length == 3, s"expected 3 files: ${stats.toList}")
    stats.foreach { case (f, n, lo, hi, dist) =>
      assert(lo == 0L && hi == n - 1 && dist == n,
        s"$f: row_index must enumerate 0..${n - 1}: ($n, $lo, $hi, $dist)")
    }
    assert(stats.map(_._2).sum == 100L, stats.toList.toString)
    // row-level: (file, row_idx) is a unique address for every row
    val addr = spark.read.parquet(dir)
      .select(col("_metadata.file_name"), col("_metadata.row_index"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
    assert(addr.map(_._1).distinct.length == 100,
      "(file, row_idx) must be a unique row address")
    assert(addr.map(_._2).toSet == (1L to 100L).toSet)
  }
}
