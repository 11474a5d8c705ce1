package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-quality constraint checking — the expectations gate a pipeline
  * runs before publishing a table (the Deequ/dbt-tests class of
  * operation): declare what must hold, get back one row per constraint
  * with its violation count. A 100 TB table can't afford one scan per
  * expectation, so the checker compiles every ROW-LEVEL constraint into
  * a single aggregate pass (one conditional sum per constraint — the
  * same one-labeled-pass discipline as [[Ingest.qpIngest]]); only
  * constraints that are genuinely relational (uniqueness, referential
  * integrity) get their own aggregation or join, and the FK probe
  * builds on the dimension side (broadcast for real dims), never
  * shuffling the fact table.
  */
object Constraints {
  private val T = Tables

  /** One expectation: `name` labels the report row, `violates` is a
    * boolean Column that is true on each OFFENDING row. */
  final case class RowRule(name: String, violates: Column)

  def notNull(c: String): RowRule = RowRule(s"not_null($c)", col(c).isNull)
  def nonNegative(c: String): RowRule =
    RowRule(s"non_negative($c)", col(c) < 0)
  def inSet(c: String, allowed: Seq[String]): RowRule =
    RowRule(s"in_set($c)", !col(c).isin(allowed: _*) || col(c).isNull)
  def inRange(c: String, lo: Double, hi: Double): RowRule =
    RowRule(s"in_range($c)", col(c) < lo || col(c) > hi || col(c).isNull)

  /** All row-level rules in ONE aggregate over ONE scan. */
  def checkRows(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty, "checkRows: at least one rule")
    val sums = rules.map(r =>
      sum(when(r.violates, 1L).otherwise(0L)).as(r.name))
    val wide = df.agg(sums.head, sums.tail: _*)
    // unpivot the single wide row to (constraint, violations)
    val stacked = rules.map(r =>
      s"'${r.name}', `${r.name}`").mkString(", ")
    wide.selectExpr(
      s"stack(${rules.size}, $stacked) AS (rule, violations)")
  }

  /** Duplicate-key count: rows beyond the first of each key group. */
  def checkUnique(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") - 1), lit(0L)).as("violations"))
      .select(lit(s"unique(${keys.mkString(", ")})").as("rule"),
        col("violations"))

  /** Referential integrity: fact rows whose key misses the dimension.
    * The anti-join build side is the DISTINCT dimension keys —
    * broadcast-sized for a real dimension, so the fact side never
    * shuffles. Null FKs are orphans (count them; a nullable-FK table
    * should filter first). */
  def checkForeignKey(fact: DataFrame, fkCol: String,
                      dim: DataFrame, refCol: String): DataFrame =
    fact.select(col(fkCol))
      .join(broadcast(dim.select(col(refCol).as(fkCol)).distinct()),
        Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(s"foreign_key($fkCol -> $refCol)").as("rule"),
        col("violations"))

  /** QA1 — the constraint report for `orders` with one planted
    * violation class per constraint kind, via deterministic row
    * corruption (doc-id arithmetic, mirrored in the oracle): nulled
    * priorities, negative totals, out-of-set statuses, duplicate keys,
    * and dangling customer references. The report pins both the zero
    * rows (clean constraints stay clean) and the exact violation
    * counts. */
  def qaConstraints(spark: SparkSession, d: String): DataFrame = {
    val base = T.orders(spark, d)
    // deterministic corruption — each class hits a disjoint residue of
    // o_orderkey % 101 so counts are independently checkable
    val corrupted = base
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 101 === 3, lit(null: String))
          .otherwise(col("o_orderpriority")))
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 101 === 5, -col("o_totalprice"))
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 101 === 7, lit("Z"))
          .otherwise(col("o_orderstatus")))
      .withColumn("o_custkey",
        when(col("o_orderkey") % 101 === 11, -col("o_custkey") - 1)
          .otherwise(col("o_custkey")))
    val dupes = base.filter(col("o_orderkey") % 101 === 13)
    val df = corrupted.unionByName(dupes.select(corrupted.columns.map(col).toIndexedSeq: _*))
    val rowReport = checkRows(df, Seq(
      notNull("o_orderpriority"),
      nonNegative("o_totalprice"),
      inSet("o_orderstatus", Seq("O", "F", "P")),
      notNull("o_orderdate")))
    rowReport
      .unionByName(checkUnique(df, Seq("o_orderkey")))
      .unionByName(checkForeignKey(df, "o_custkey",
        T.customer(spark, d), "c_custkey"))
      .orderBy("rule")
  }

  /** Key-skew diagnostic: the distribution of per-key group sizes for a
    * prospective shuffle/join key — the profile every partition-strategy
    * decision at 100 TB starts from (is the hottest key's fan-out safe?
    * does the join need salting? how far is p99 above the median?).
    * One aggregate builds per-key counts (map-side combined), a second
    * reduces them to a one-row profile; only the profile leaves the
    * executors. `skew_ratio` = max/mean is the [[Skew]] salting
    * trigger; `top_share` = max/total bounds the worst task. */
  def skewReport(df: DataFrame, keys: Seq[String]): DataFrame = {
    val sizes = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    sizes.agg(
      count(lit(1)).as("n_keys"),
      sum("n").cast("long").as("n_rows"),
      max("n").as("max_n"),
      round(avg("n"), 6).as("mean_n"),
      round(expr("percentile(n, 0.5)"), 6).as("p50"),
      round(expr("percentile(n, 0.9)"), 6).as("p90"),
      round(expr("percentile(n, 0.99)"), 6).as("p99"),
      round(max("n") / avg("n"), 6).as("skew_ratio"),
      round(max("n").cast("double") / sum("n"), 6).as("top_share"))
  }

  /** QA2 — [[skewReport]] for lineitem's supplier key (the classic
    * "can I shuffle on this?" question). */
  def qaSkewReport(spark: SparkSession, d: String): DataFrame =
    skewReport(T.lineitem(spark, d), Seq("l_suppkey"))

  /** Distribution-drift report between two snapshots of a numeric
    * column — the population stability index (PSI), the standard
    * train-vs-serve / yesterday-vs-today drift gate: fixed-width bins
    * (top bin clamps the tail), add-one smoothing so an empty bin on
    * either side stays finite, per-bin contribution
    * (p−q)·ln(p/q), and the total. PSI < 0.1 is conventionally stable,
    * > 0.25 action-worthy.
    *
    * Both snapshots count in ONE conditional aggregate over one scan
    * (no per-side passes), and the whole report is a bins-sized frame.
    * Determinism: contributions are rounded at 1e-9 and summed as
    * BIGINTs (order-free — the qt_entropy discipline), so the total
    * never depends on float summation order. */
  def driftReport(df: DataFrame, valueCol: String, isCurrent: Column,
                  binWidth: Double, maxBin: Int): DataFrame = {
    val nBins = maxBin + 1
    val binned = df.withColumn("bin",
      least(floor(col(valueCol) / binWidth), lit(maxBin)).cast("long"))
    val counts = binned.groupBy("bin").agg(
      sum(when(!isCurrent, 1L).otherwise(0L)).as("n_ref"),
      sum(when(isCurrent, 1L).otherwise(0L)).as("n_cur"))
    val tots = counts.agg(
      sum("n_ref").as("tot_ref"), sum("n_cur").as("tot_cur"))
    val contrib = counts.crossJoin(broadcast(tots))
      .withColumn("p", (col("n_ref") + 1).cast("double") / (col("tot_ref") + nBins))
      .withColumn("q", (col("n_cur") + 1).cast("double") / (col("tot_cur") + nBins))
      .withColumn("contrib_s",
        round((col("p") - col("q")) * log(col("p") / col("q")) * 1e9).cast("long"))
    contrib
      .crossJoin(broadcast(contrib.agg(sum("contrib_s").as("psi_s"))))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(col("contrib_s") / 1e9, 6).as("contrib"),
        round(col("psi_s") / 1e9, 6).as("psi_total"))
      .orderBy("bin")
  }

  /** QA3 — [[driftReport]] over `events.value`, even vs odd event ids
    * as the two snapshots (near-identical distributions ⇒ a stable-PSI
    * fixture; the spec plants real drift). */
  def qaDriftReport(spark: SparkSession, d: String): DataFrame =
    driftReport(T.events(spark, d), "value", col("event_id") % 2 === 1,
      binWidth = 50.0, maxBin = 9)

  /** Poisson(1) inverse-CDF cutoffs as 8-hex-char md5-prefix literals:
    * a row's bootstrap weight in replicate r is k iff
    * substring(md5(seed:r:id), 1, 8) < cutoff(k) first holds (else the
    * capped tail weight 5 — P(>5) ≈ 0.06%). Computed ONCE here and
    * embedded verbatim in both the Spark plan and the oracle SQL, so the
    * engines cannot disagree; comparison is plain hex-string ordering —
    * the qt_split / qp_sample determinism device, no numeric conversion. */
  private val poissonCutoffs: Seq[String] = {
    var cdf = 0.0
    (0 to 4).map { k =>
      cdf += math.exp(-1.0) / (1 to k).product.toDouble.max(1.0)
      f"${math.floor(cdf * 4294967296.0).toLong}%08x"
    }
  }

  /** Distributed bootstrap confidence interval for a mean — the
    * resampling answer to "how sure is this corpus statistic?" that a
    * fleet-scale eval pipeline needs (a point mean over a 100 TB corpus
    * without an error bar is uninterpretable). Classic row-resampling
    * cannot shuffle a bootstrap sample per replicate at scale; the
    * scalable form is POISSON bootstrap (Chamandy et al. 2012, "Estimating
    * uncertainty for massive data streams" — public): each row enters
    * replicate r with weight ~ Poisson(1), independent across replicates,
    * so every replicate is one conditional aggregate over ONE scan.
    *
    * Scale shape: the b-fold `explode(sequence(...))` multiplies rows
    * SCAN-SIDE only — partial aggregation reduces each partition to b
    * rows before the shuffle (partitions×b rows move, never data×b).
    * Weights are deterministic (md5 inverse-CDF, [[poissonCutoffs]]);
    * weighted sums are exact BIGINTs, so replicate means are identical
    * doubles in both engines. The CI is nearest-rank over the b replicate
    * means — picked from a `sort_array(collect_list(...))` aggregate
    * over the bounded b-row set, NOT a global window (the PlanGuardSpec
    * no-single-partition-window rule): lo = 2nd, hi = 49th of 50 at
    * 95%. Rank ties are value-identical, so value-sorting needs no id
    * tiebreak. */
  def bootstrapCiMean(df: DataFrame, valueCol: String, idCol: String,
                      b: Int = 50, seed: String = "boot"): DataFrame = {
    require(b >= 10, "bootstrapCiMean: need >= 10 replicates for a CI")
    val hk = substring(md5(concat(lit(seed), lit(":"),
      col("rep").cast("string"), lit(":"), col(idCol).cast("string"))), 1, 8)
    val w = poissonCutoffs.zipWithIndex
      .foldRight(lit(5L): Column) { case ((cut, k), rest) =>
        when(col("hk") < lit(cut), k.toLong).otherwise(rest)
      }
    val reps = df.select(col(valueCol).cast("long").as("x"), col(idCol))
      .withColumn("rep", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("hk", hk)
      .withColumn("w", w)
      .groupBy("rep")
      .agg(sum(col("w") * col("x")).as("swx"), sum("w").as("sw"))
      .withColumn("mean_r", round(col("swx").cast("double") / col("sw"), 6))
    val loRank = math.max(1, math.ceil(0.025 * b).toInt)
    val hiRank = math.min(b, math.ceil(0.975 * b).toInt)
    val ci = reps.agg(
        count(lit(1)).as("n_reps"),
        sort_array(collect_list("mean_r")).as("ms"))
      .select(col("n_reps"),
        element_at(col("ms"), loRank).as("ci_lo"),
        element_at(col("ms"), hiRank).as("ci_hi"))
    val point = df.agg(
      round(sum(col(valueCol).cast("long")).cast("double") / count(lit(1)), 6)
        .as("point_mean"))
    ci.crossJoin(broadcast(point))
      .select(col("n_reps"), col("point_mean"), col("ci_lo"), col("ci_hi"))
  }

  /** QA4 — [[bootstrapCiMean]] for the corpus-mean document length
    * (50 replicates, 95% nearest-rank CI). */
  def qaBootstrapCi(spark: SparkSession, d: String): DataFrame =
    bootstrapCiMean(T.documents(spark, d), "n_chars", "doc_id")

  /** Per-group [[bootstrapCiMean]] — the per-language / per-source CI
    * a mixture report actually needs. Same single-scan shape with the
    * group key joined into every aggregate: (group, rep) partial
    * aggregates shuffle partitions×groups×b rows, the CI pick is a
    * per-GROUP `sort_array(collect_list)` over b values (bounded, and
    * keyed — no global anything). */
  def bootstrapCiMeanBy(df: DataFrame, groupCol: String, valueCol: String,
                        idCol: String, b: Int = 50,
                        seed: String = "boot"): DataFrame = {
    require(b >= 10, "bootstrapCiMeanBy: need >= 10 replicates for a CI")
    val hk = substring(md5(concat(lit(seed), lit(":"),
      col("rep").cast("string"), lit(":"), col(idCol).cast("string"))), 1, 8)
    val w = poissonCutoffs.zipWithIndex
      .foldRight(lit(5L): Column) { case ((cut, k), rest) =>
        when(col("hk") < lit(cut), k.toLong).otherwise(rest)
      }
    val reps = df.select(col(groupCol), col(valueCol).cast("long").as("x"), col(idCol))
      .withColumn("rep", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("hk", hk)
      .withColumn("w", w)
      .groupBy(groupCol, "rep")
      .agg(sum(col("w") * col("x")).as("swx"), sum("w").as("sw"))
      .withColumn("mean_r", round(col("swx").cast("double") / col("sw"), 6))
    val loRank = math.max(1, math.ceil(0.025 * b).toInt)
    val hiRank = math.min(b, math.ceil(0.975 * b).toInt)
    val ci = reps.groupBy(groupCol)
      .agg(count(lit(1)).as("n_reps"),
        sort_array(collect_list("mean_r")).as("ms"))
      .select(col(groupCol), col("n_reps"),
        element_at(col("ms"), loRank).as("ci_lo"),
        element_at(col("ms"), hiRank).as("ci_hi"))
    val point = df.groupBy(groupCol)
      .agg(round(sum(col(valueCol).cast("long")).cast("double") / count(lit(1)), 6)
        .as("point_mean"))
    ci.join(point, groupCol)
      .select(col(groupCol), col("n_reps"), col("point_mean"),
        col("ci_lo"), col("ci_hi"))
      .orderBy(groupCol)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qa_constraints" -> qaConstraints _,
    "qa_skew_report" -> qaSkewReport _,
    "qa_drift_report" -> qaDriftReport _,
    "qa_bootstrap_ci" -> qaBootstrapCi _)

  val oracles: Map[String, String] = Map(
    // same md5 inverse-CDF weights (cutoff literals generated from the
    // SAME Scala vals the Spark plan embeds), exact BIGINT weighted
    // sums, same nearest-rank CI over the 50 replicate means
    "qa_bootstrap_ci" -> {
      val wCase = "CASE " + poissonCutoffs.zipWithIndex
        .map { case (c, k) => s"WHEN hk < '$c' THEN $k " }.mkString + "ELSE 5 END"
      val (loRank, hiRank) = (math.max(1, math.ceil(0.025 * 50).toInt),
        math.min(50, math.ceil(0.975 * 50).toInt))
      "WITH r AS (SELECT rep, n_chars, " +
        "substr(md5('boot:' || rep || ':' || doc_id), 1, 8) AS hk " +
        "FROM documents CROSS JOIN (SELECT unnest(range(50)) AS rep)), " +
        s"w AS (SELECT rep, n_chars, $wCase AS w FROM r), " +
        "a AS (SELECT rep, SUM(w * n_chars) AS swx, SUM(w) AS sw FROM w GROUP BY rep), " +
        "m AS (SELECT rep, ROUND(CAST(swx AS DOUBLE) / sw, 6) AS mean_r FROM a), " +
        "ci AS (SELECT COUNT(*) AS n_reps, " +
        s"list_sort(list(mean_r))[$loRank] AS ci_lo, " +
        s"list_sort(list(mean_r))[$hiRank] AS ci_hi FROM m), " +
        "p AS (SELECT ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS point_mean " +
        "FROM documents) " +
        "SELECT CAST(n_reps AS BIGINT) AS n_reps, point_mean, ci_lo, ci_hi " +
        "FROM ci CROSS JOIN p"
    },
    // same one-pass conditional bin counts, same add-one smoothing,
    // contributions rounded at 1e-9 and summed as BIGINTs (order-free).
    // floor(), NOT `//`: DuckDB's `//` on DOUBLE operands is plain
    // division (integer division only for integer types), and CAST to
    // BIGINT would then ROUND — both diverge from Spark's floor()
    "qa_drift_report" ->
      ("WITH b AS (SELECT least(CAST(floor(value / 50) AS BIGINT), 9) AS bin, " +
        "event_id % 2 = 1 AS cur FROM events), " +
        "c AS (SELECT bin, SUM(CASE WHEN cur THEN 0 ELSE 1 END) AS n_ref, " +
        "SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS n_cur FROM b GROUP BY bin), " +
        "t AS (SELECT SUM(n_ref) AS tot_ref, SUM(n_cur) AS tot_cur FROM c), " +
        "k AS (SELECT bin, n_ref, n_cur, " +
        "CAST(n_ref + 1 AS DOUBLE) / (tot_ref + 10) AS p, " +
        "CAST(n_cur + 1 AS DOUBLE) / (tot_cur + 10) AS q FROM c CROSS JOIN t), " +
        "s AS (SELECT bin, n_ref, n_cur, " +
        "CAST(ROUND((p - q) * ln(p / q) * 1e9) AS BIGINT) AS cs FROM k), " +
        "tot AS (SELECT SUM(cs) AS psi_s FROM s) " +
        "SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur, " +
        "ROUND(cs / 1e9, 6) AS contrib, ROUND(psi_s / 1e9, 6) AS psi_total " +
        "FROM s CROSS JOIN tot ORDER BY bin"),
    // same two-level aggregate; percentile ↔ quantile_cont (both exact
    // linear interpolation), profile doubles rounded on both sides
    "qa_skew_report" ->
      ("WITH s AS (SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey) " +
        "SELECT COUNT(*) AS n_keys, CAST(SUM(n) AS BIGINT) AS n_rows, MAX(n) AS max_n, " +
        "ROUND(AVG(n), 6) AS mean_n, ROUND(quantile_cont(n, 0.5), 6) AS p50, " +
        "ROUND(quantile_cont(n, 0.9), 6) AS p90, ROUND(quantile_cont(n, 0.99), 6) AS p99, " +
        "ROUND(CAST(MAX(n) AS DOUBLE) / AVG(n), 6) AS skew_ratio, " +
        "ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n), 6) AS top_share FROM s"),
    "qa_constraints" ->
      ("WITH c AS (SELECT o_orderkey, " +
        "CASE WHEN o_orderkey % 101 = 3 THEN NULL ELSE o_orderpriority END AS pri, " +
        "CASE WHEN o_orderkey % 101 = 5 THEN -o_totalprice ELSE o_totalprice END AS tot, " +
        "CASE WHEN o_orderkey % 101 = 7 THEN 'Z' ELSE o_orderstatus END AS st, " +
        "CASE WHEN o_orderkey % 101 = 11 THEN -o_custkey - 1 ELSE o_custkey END AS ck, " +
        "o_orderdate FROM orders), " +
        "d AS (SELECT * FROM c UNION ALL SELECT * FROM c WHERE o_orderkey % 101 = 13) " +
        "SELECT 'foreign_key(o_custkey -> c_custkey)' AS rule, " +
        "COUNT(*) AS violations FROM d WHERE ck NOT IN (SELECT c_custkey FROM customer) " +
        "UNION ALL SELECT 'in_set(o_orderstatus)', " +
        "COUNT(*) FILTER (WHERE st NOT IN ('O','F','P') OR st IS NULL) FROM d " +
        "UNION ALL SELECT 'non_negative(o_totalprice)', " +
        "COUNT(*) FILTER (WHERE tot < 0) FROM d " +
        "UNION ALL SELECT 'not_null(o_orderdate)', " +
        "COUNT(*) FILTER (WHERE o_orderdate IS NULL) FROM d " +
        "UNION ALL SELECT 'not_null(o_orderpriority)', " +
        "COUNT(*) FILTER (WHERE pri IS NULL) FROM d " +
        "UNION ALL SELECT 'unique(o_orderkey)', " +
        "(SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) FROM " +
        "(SELECT COUNT(*) AS n FROM d GROUP BY o_orderkey)) " +
        "ORDER BY rule"))
}
