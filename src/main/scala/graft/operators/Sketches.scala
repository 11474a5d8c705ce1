package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sketch persistence — the incremental-analytics pattern a 100 TB lake
  * depends on: build tiny MERGEABLE summaries once per partition (per
  * day/month/file), store them as binary columns next to the data, and
  * answer later distinct-count rollups by merging kilobyte sketches
  * instead of rescanning terabytes. Spark ships Apache DataSketches HLL
  * natively (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`
  * — codegen'd Catalyst aggregates, not UDFs), so the whole pattern is
  * declarative and rides normal partial/final aggregation.
  *
  * Why this beats `approx_count_distinct` (q22) at scale: HLL state
  * there is query-internal — every new rollup (month → quarter → year →
  * ad-hoc slice) rescans the raw table. A PERSISTED sketch column is
  * computed in the single pass the data is already making through the
  * ingest pipeline; every later rollup is an aggregation over one tiny
  * row per partition. Re-aggregation is exact with respect to the
  * sketch: HLL register state is a set-function of the hashed input
  * (per-register max), so merging per-month partials yields BIT-
  * IDENTICAL registers — and therefore the identical estimate — to
  * sketching the whole input directly, regardless of row order,
  * partitioning, or duplicate placement. SketchesSpec pins that
  * equality, the parquet persistence round-trip, and a relative-error
  * bound against the exact distinct count.
  */
object Sketches {

  /** Per-month partial sketches of distinct customers — the "computed
    * at ingest, stored next to the partition" summary. `lgConfigK` = 12
    * (the Spark default): 4 KB of registers, ~1.6% standard error. */
  def customerSketchByMonth(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"), col("o_custkey"))
      .groupBy("month")
      .agg(hll_sketch_agg(col("o_custkey"), lit(12)).as("sketch"),
        count(lit(1)).as("orders"))

  /** Roll stored partials up to years by MERGING sketches — no raw-data
    * rescan. `union_estimate` is what a dashboard reads. */
  def rollupToYears(partials: DataFrame): DataFrame =
    partials
      .withColumn("year", substring(col("month"), 1, 4))
      .groupBy("year")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_customers"),
        sum("orders").as("orders"))
      .orderBy("year")

  /** QK1 — the end-to-end pattern in one plan: per-month sketches →
    * merge → per-year approximate distinct customers. Approximate ⇒ no
    * SQL oracle (DuckDB has no compatible HLL binary); SketchesSpec
    * bounds it against the exact distinct count and proves
    * merged-partials ≡ direct-sketch equality. */
  def qkHllRollup(spark: SparkSession, d: String): DataFrame =
    rollupToYears(customerSketchByMonth(spark, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qk_hll_rollup" -> qkHllRollup _)

  /** No oracle: DataSketches HLL binaries aren't reproducible in DuckDB.
    * The driver records a rows-only check; SketchesSpec carries the
    * correctness argument. */
  val oracles: Map[String, String] = Map.empty
}
