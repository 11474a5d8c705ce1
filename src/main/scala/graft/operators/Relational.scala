package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** The relational query surface (SURVEY.md §2.3 Q1-Q16).
  *
  * Q1/Q2 are the two reference applications re-expressed relationally:
  * `sort` = DISTINCT + total order (`/root/reference/map___reduce/sort.c:9-36`)
  * and `wordcount` = GROUP BY COUNT (`/root/reference/map___reduce/wordcount.c:9-40`).
  * The rest pin the generalized surface (joins, windows, set ops, rollup,
  * string/date/JSON functions) that the reference's map→shuffle→reduce
  * skeleton generalizes to.
  *
  * Determinism discipline (driver hash-compares against DuckDB):
  *  - every query ends in a total ORDER BY;
  *  - double SUMs go through DECIMAL(18,s) so the aggregate is *exact* and
  *    independent of partition/addition order (a raw double sum differs in
  *    late ulps between engines and between runs — at 100 TB a float sum is
  *    never reproducible), then cast back to double for a stable schema;
  *  - counts stay BIGINT on both sides (DuckDB SUM(int) would widen to
  *    HUGEINT, so oracle SQL casts integer sums back to BIGINT).
  *
  * Scale notes: all aggregates here are partial+final (map-side combine is
  * automatic in HashAggregateExec); the joins in Q5-Q7 broadcast the small
  * side explicitly so only the fact table streams; filters/projections sit
  * directly on the parquet scan so pushdown + column pruning apply.
  */
object Relational {
  private val T = Tables

  /** Exact, order-independent money sum: SUM(CAST(c AS DECIMAL(18,s)))
    * rounded and cast to double. Identical bit-for-bit in Spark and DuckDB.
    */
  private def dsum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast(DecimalType(18, scale))), scale).cast("double")

  /** Q1 — the `sort` app (O12): DISTINCT + global order. */
  def q1Distinct(spark: SparkSession, d: String): DataFrame =
    T.lineitem(spark, d).select("l_orderkey").distinct().orderBy("l_orderkey")

  /** Q2 — the `wordcount` app (O11): GROUP BY key COUNT(*), key-sorted. */
  def q2GroupCount(spark: SparkSession, d: String): DataFrame =
    T.orders(spark, d).select(col("o_orderpriority").as("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .orderBy("key")

  /** Q3 — filter + projection (pushed down to the parquet scan). */
  def q3FilterProject(spark: SparkSession, d: String): DataFrame =
    T.lineitem(spark, d)
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber")

  /** Q4 — multi-aggregate with exact decimal sums. */
  def q4MultiAgg(spark: SparkSession, d: String): DataFrame =
    T.lineitem(spark, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("s"),
        round(sum(col("l_discount").cast(DecimalType(18, 6))).cast("double")
          / count(lit(1)), 6).as("a"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q5 — equi join with a broadcast-sized dimension. */
  def q5Join(spark: SparkSession, d: String): DataFrame =
    T.customer(spark, d)
      .join(T.dim(spark, d, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("c"))
      .orderBy("n_name")

  /** Q6 — 3-way join + aggregate. region/nation are bounded dims and are
    * broadcast explicitly; customer grows with SF (~150M rows at sf1000) so
    * its join is left to AQE — broadcast at small SF, shuffle-hash at scale
    * — rather than pinned to a broadcast that would OOM a 100 TB run. */
  def q6MultiJoin(spark: SparkSession, d: String): DataFrame =
    T.orders(spark, d).select("o_custkey", "o_totalprice")
      .join(T.customer(spark, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(T.dim(spark, d, "nation").select("n_nationkey", "n_regionkey"),
        col("c_nationkey") === col("n_nationkey"))
      .join(T.dim(spark, d, "region").select("r_regionkey", "r_name"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(dsum(col("o_totalprice")).as("rev"))
      .orderBy("r_name")

  /** Q7 — anti join (NOT IN with a non-null subquery ≡ LEFT ANTI).
    * Restricted to urgent orders so the result is non-empty at every SF. */
  def q7AntiJoin(spark: SparkSession, d: String): DataFrame =
    T.customer(spark, d).select("c_custkey")
      .join(T.orders(spark, d).filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .orderBy("c_custkey")

  /** Q7b — semi join (IN / EXISTS ≡ LEFT SEMI). */
  def q7SemiJoin(spark: SparkSession, d: String): DataFrame =
    T.customer(spark, d).select("c_custkey")
      .join(T.orders(spark, d).filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .orderBy("c_custkey")

  /** Q8 — per-group top-k via ROW_NUMBER (deterministic tiebreak). */
  def q8TopKPerGroup(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    T.orders(spark, d).select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Q9 — running sum, computed as a two-phase distributed prefix sum.
    *
    * A naive `Window.orderBy` with no partitionBy funnels every row through
    * ONE task ("Moving all data to a single partition") — correct, but a
    * non-starter at 100 TB. Instead:
    *   1. bucket rows by key range (`pid = key * NB / (max+1)` — a pure
    *      function of the row, so recomputed plan subtrees always agree,
    *      unlike sampled RangePartitioner boundaries);
    *   2. per-bucket running sums in parallel (window partitioned by pid);
    *   3. per-bucket totals → cumulative offsets (NB rows — trivially small
    *      at any scale) broadcast back and added.
    * Decimal arithmetic keeps the sum exact, so phase order can't change
    * the result. Buckets are balanced when keys are near-uniform (true for
    * dense surrogate keys); skewed keys would want quantile buckets instead.
    *
    * Cost note: the plan scans the source twice (per-row pass + per-bucket
    * totals pass) since nothing is cached — at scale that's 2× a 2-column
    * columnar scan, the standard price of a distributed prefix sum without
    * materialization; persist `base` if the input is hot.
    */
  def q9RunningSum(spark: SparkSession, d: String): DataFrame = {
    val nb = 32
    val maxKey = T.orders(spark, d).agg(max("o_orderkey").as("mk"))
    val base = T.orders(spark, d).select("o_orderkey", "o_totalprice")
      .join(broadcast(maxKey))
      .withColumn("pid", (col("o_orderkey") * nb / (col("mk") + 1)).cast("int"))
      .withColumn("v", col("o_totalprice").cast(DecimalType(18, 2)))
    val wLocal = Window.partitionBy("pid").orderBy("o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Per-bucket totals → cumulative offsets WITHOUT a global window (a
    // Window.orderBy with no partitionBy — even over 32 rows — fires the
    // "No Partition Defined" warning the plan guard exists to catch).
    // Instead each bucket's total is exploded to every HIGHER bucket id and
    // summed there: pure equi-groupBy over ≤ nb² tiny rows, no window, no
    // nested-loop join. Bucket 0 (and any bucket no smaller bucket feeds)
    // simply has no offset row → left join + coalesce(0).
    val offsets = base.groupBy("pid").agg(sum(col("v")).as("ptot"))
      .filter(col("pid") < nb - 1) // the last bucket feeds no one
      .select(explode(sequence(col("pid") + 1, lit(nb - 1))).as("pid"), col("ptot"))
      .groupBy("pid").agg(sum("ptot").as("off"))
    base
      .withColumn("lrt", sum(col("v")).over(wLocal))
      .join(broadcast(offsets), Seq("pid"), "left")
      .withColumn("rt", round(col("lrt")
        + coalesce(col("off"), lit(0).cast(DecimalType(18, 2))), 2).cast("double"))
      .select("o_orderkey", "rt")
      .orderBy("o_orderkey")
  }

  /** Q10 — set operation (INTERSECT is distinct-semantics in both engines). */
  def q10Intersect(spark: SparkSession, d: String): DataFrame =
    T.customer(spark, d).select(col("c_nationkey").as("k"))
      .intersect(T.supplier(spark, d).select(col("s_nationkey").as("k")))
      .orderBy("k")

  /** Q11 — string functions + LIKE predicate. */
  def q11StringFns(spark: SparkSession, d: String): DataFrame =
    T.part(spark, d)
      .filter(col("p_name").like("%a%"))
      .select(upper(col("p_brand")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .orderBy("b")

  /** Q12 — date functions (timestamp → date in UTC on both engines). */
  def q12DateFns(spark: SparkSession, d: String): DataFrame =
    T.orders(spark, d)
      .select(col("o_orderdate").cast("date").as("d"))
      .groupBy("d").agg(count(lit(1)).as("c"))
      .orderBy("d")

  /** Q13 — event-time tumbling window, batch form (streaming twin lives in
    * graft.streaming.EventStreams). */
  def q13TimeWindow(spark: SparkSession, d: String): DataFrame =
    T.events(spark, d)
      .select(date_trunc("hour", col("ts")).as("w"), col("event_type"), col("value"))
      .groupBy("w", "event_type")
      .agg(count(lit(1)).as("c"), dsum(col("value")).as("s"))
      .orderBy("w", "event_type")

  /** Q14 — ROLLUP grouping sets; NULLS FIRST pinned on both sides because
    * Spark's ASC default is nulls-first while DuckDB's is nulls-last. */
  def q14Rollup(spark: SparkSession, d: String): DataFrame =
    T.orders(spark, d)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("c"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first, col("c"))

  /** Q15 — exact distinct aggregate (expands to a two-phase plan). */
  def q15CountDistinct(spark: SparkSession, d: String): DataFrame =
    T.orders(spark, d).agg(countDistinct(col("o_custkey")).as("c"))

  /** Q16 — text-table aggregate (north-star `documents` table). */
  def q16DocStats(spark: SparkSession, d: String): DataFrame =
    T.documents(spark, d)
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"), sum("n_chars").as("chars"))
      .orderBy("lang")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_distinct" -> q1Distinct _,
    "q2_group_count" -> q2GroupCount _,
    "q3_filter_project" -> q3FilterProject _,
    "q4_multi_agg" -> q4MultiAgg _,
    "q5_join" -> q5Join _,
    "q6_multi_join" -> q6MultiJoin _,
    "q7_anti_join" -> q7AntiJoin _,
    "q7_semi_join" -> q7SemiJoin _,
    "q8_topk_per_group" -> q8TopKPerGroup _,
    "q9_running_sum" -> q9RunningSum _,
    "q10_intersect" -> q10Intersect _,
    "q11_string_fns" -> q11StringFns _,
    "q12_date_fns" -> q12DateFns _,
    "q13_time_window" -> q13TimeWindow _,
    "q14_rollup" -> q14Rollup _,
    "q15_count_distinct" -> q15CountDistinct _,
    "q16_doc_stats" -> q16DocStats _)

  val oracles: Map[String, String] = Map(
    "q1_distinct" ->
      "SELECT DISTINCT l_orderkey FROM lineitem ORDER BY l_orderkey",
    "q2_group_count" ->
      "SELECT o_orderpriority AS key, COUNT(*) AS cnt FROM orders GROUP BY o_orderpriority ORDER BY key",
    "q3_filter_project" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber",
    "q4_multi_agg" ->
      ("SELECT l_returnflag, l_linestatus, COUNT(*) AS n, " +
        "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS s, " +
        "ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS a " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "q5_join" ->
      "SELECT n_name, COUNT(*) AS c FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name",
    "q6_multi_join" ->
      ("SELECT r_name, CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS rev " +
        "FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name"),
    "q7_anti_join" ->
      ("SELECT c_custkey FROM customer WHERE c_custkey NOT IN " +
        "(SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') ORDER BY c_custkey"),
    "q7_semi_join" ->
      ("SELECT c_custkey FROM customer WHERE c_custkey IN " +
        "(SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') ORDER BY c_custkey"),
    "q8_topk_per_group" ->
      ("SELECT o_custkey, o_orderkey, rn FROM (SELECT o_custkey, o_orderkey, " +
        "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
        "FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "q9_running_sum" ->
      ("SELECT o_orderkey, CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) " +
        "OVER (ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS rt " +
        "FROM orders ORDER BY o_orderkey"),
    "q10_intersect" ->
      "SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey AS k FROM supplier ORDER BY k",
    "q11_string_fns" ->
      "SELECT UPPER(p_brand) AS b, COUNT(*) AS c FROM part WHERE p_name LIKE '%a%' GROUP BY UPPER(p_brand) ORDER BY b",
    "q12_date_fns" ->
      "SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS c FROM orders GROUP BY CAST(o_orderdate AS DATE) ORDER BY d",
    "q13_time_window" ->
      ("SELECT date_trunc('hour', ts) AS w, event_type, COUNT(*) AS c, " +
        "CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS s " +
        "FROM events GROUP BY date_trunc('hour', ts), event_type ORDER BY w, event_type"),
    "q14_rollup" ->
      ("SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c FROM orders " +
        "GROUP BY ROLLUP(o_orderstatus, o_orderpriority) " +
        "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, c"),
    "q15_count_distinct" ->
      "SELECT COUNT(DISTINCT o_custkey) AS c FROM orders",
    "q16_doc_stats" ->
      ("SELECT lang, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars " +
        "FROM documents GROUP BY lang ORDER BY lang"))
}
