package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import graft.operators.{Sketches, TextAnalysis}
import graft.sources.Tables

/** Sketch-persistence correctness (qk_hll_rollup has no SQL oracle —
  * DuckDB can't reproduce DataSketches HLL binaries — so the correctness
  * argument lives here) + the deterministic-sampling operator. */
class SketchesSpec extends SparkSpec {

  private def mergedByYear: Map[String, Long] =
    Sketches.qkHllRollup(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("merging per-month partials equals sketching the whole input directly") {
    // HLL registers are a set-function of the hashed input (per-register
    // max), so the merged estimate must be IDENTICAL, not merely close
    val direct = Tables.orders(spark, sfTiny)
      .select(date_format(col("o_orderdate"), "yyyy").as("year"), col("o_custkey"))
      .groupBy("year")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(12))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = mergedByYear
    assert(merged.nonEmpty)
    assert(merged == direct)
  }

  test("estimates land within the HLL error envelope of the exact distinct count") {
    val exact = Tables.orders(spark, sfTiny)
      .select(date_format(col("o_orderdate"), "yyyy").as("year"), col("o_custkey"))
      .groupBy("year")
      .agg(countDistinct(col("o_custkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = mergedByYear
    assert(merged.keySet == exact.keySet)
    merged.foreach { case (year, est) =>
      val e = exact(year).toDouble
      // lgConfigK=12 ⇒ ~1.6% standard error; 5% is > 3 sigma
      assert(math.abs(est - e) / e < 0.05, s"$year: est $est vs exact $e")
    }
  }

  test("sketch partials survive a parquet round trip and still merge") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sketches").toString
    val partials = Sketches.customerSketchByMonth(spark, sfTiny)
    assert(partials.schema("sketch").dataType == BinaryType, "sketches must be storable binary")
    partials.write.mode("overwrite").parquet(dir)
    val reread = Sketches.rollupToYears(spark.read.parquet(dir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reread == mergedByYear)
    // the stored summary is kilobytes per partition, not data-sized
    val maxLen = partials.select(max(length(col("sketch")))).head.getInt(0)
    assert(maxLen <= 4096 + 64, s"sketch blob unexpectedly large: $maxLen bytes")
  }

  // ---- deterministic per-stratum sampling (qp_sample) ----

  test("qp_sample keeps exactly min(k, stratum size) docs per stratum") {
    val k = 7
    val sample = TextAnalysis.qpSample(spark, sfTiny, k = k)
    val got = sample.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val strata = Tables.documents(spark, sfTiny).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == strata.keySet)
    got.foreach { case (lang, n) => assert(n == math.min(k.toLong, strata(lang)), lang) }
    // rn is a contiguous 1..n rank within each stratum
    val ranks = sample.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sorted.toSeq).toMap
    ranks.foreach { case (lang, rs) => assert(rs == (1L to rs.length), lang) }
  }

  test("qp_sample is reproducible across runs and repartitionings; seed redraws it") {
    val a = TextAnalysis.qpSample(spark, sfTiny, k = 10).collect().map(_.toSeq).toSeq
    val b = TextAnalysis.qpSample(spark, sfTiny, k = 10).collect().map(_.toSeq).toSeq
    assert(a == b, "same seed must draw the identical sample")
    val redrawn = TextAnalysis.qpSample(spark, sfTiny, k = 10, seed = "other")
      .collect().map(_.toSeq).toSeq
    assert(redrawn != a, "a different seed must redraw the sample")
    // growing the budget only EXTENDS the sample (bottom-k nesting)
    val k5 = TextAnalysis.qpSample(spark, sfTiny, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val k10 = a.map(s => (s(0).asInstanceOf[String], s(1).asInstanceOf[Long])).toSet
    assert(k5.subsetOf(k10), "k=5 sample must be a prefix of the k=10 sample")
  }
}
