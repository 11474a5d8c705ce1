package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Supervised quality/label classification for corpus curation — the
  * missing half of the pipeline's scoring story: [[TextAnalysis]] scores
  * documents with FIXED heuristics (stopword ratio, entropy, langid);
  * this module LEARNS a linear scorer from labeled examples, the way
  * production pipelines train quality/toxicity/language probes and then
  * sweep them across the corpus.
  *
  * The trainer is the classic batch perceptron (Rosenblatt 1958;
  * full-batch variant): per round, every misclassified training row
  * contributes `y·x` to the weight update, so one round is ONE
  * distributed aggregate — a map-side-combinable sum of 5 longs — and
  * the model update is a driver-side add of 5 numbers. That is the
  * parameter-server shape at its smallest: the 100-TB cost per round is
  * exactly one scan + one tiny shuffle, weights broadcast back as plan
  * literals, no per-row state, no driver-side data. (A production probe
  * with d=768 features is the same plan with a longer sum vector.)
  *
  * Everything is INTEGER arithmetic end to end — features are token and
  * substring counts, labels are ±1, margins are products of longs — so
  * the learned trajectory is bit-identical in any engine, and the DuckDB
  * oracle replays all four rounds exactly (unrolled CTE chain). That is
  * the determinism contract floating-point gradient descent cannot make,
  * and the reason the perceptron (not logistic regression) is the
  * oracle-gated distributed-training representative here.
  *
  * Train/heldout split by doc-id parity keeps the query self-contained
  * and deterministic; the output is the per-round learning trajectory —
  * update count, weight vector, heldout confusion — which is also the
  * convergence report a real training job emits.
  */
object Classifier {
  private val T = Tables

  private val dims = 5

  /** The five integer feature expressions over a `text` column: bias,
    * token count, stopword count, 'th' occurrences (English signal),
    * 'de ' occurrences (romance/German signal). Occurrence counting uses
    * the replace-difference idiom (integer-exact, same as
    * [[TextAnalysis]]'s langid). Pure per-row expressions — the same
    * columns score a batch scan or a stream. */
  private def xCols: Seq[Column] = {
    def occurrences(g: String) =
      ((length(col("text")) - length(regexp_replace(col("text"), g, ""))) / g.length)
        .cast("long")
    Seq(
      lit(1L),
      size(split(col("text"), " ")).cast("long"),
      expr("size(filter(split(text, ' '), w -> w IN ('the', 'a', 'of', 'to', 'and')))")
        .cast("long"),
      occurrences("th"),
      occurrences("de "))
  }

  /** The trained scorer as ONE column over `text`: weights are plan
    * literals (the broadcast-back leg of the parameter-server shape), so
    * applying the model anywhere — batch sweep, stream gate — is a
    * stateless codegen'd expression. */
  def scoreExpr(w: Array[Long]): Column =
    xCols.zip(w).map { case (x, wi) => lit(wi) * x }.reduce(_ + _)

  private def features(spark: SparkSession, d: String): DataFrame =
    T.documents(spark, d).select(
      col("doc_id") +:
      when(col("lang") === "en", 1L).otherwise(-1L).as("y") +:
      xCols.zipWithIndex.map { case (c, i) => c.as(s"x$i") } :+
      (col("doc_id") % 2 === 0).as("is_train"): _*)

  private def margin(w: Array[Long]): Column =
    col("y") * (0 until dims).map(i => lit(w(i)) * col(s"x$i")).reduce(_ + _)

  /** QC1 — four rounds of batch perceptron training (en vs rest) with a
    * per-round heldout confusion. Per round: one aggregate over the
    * checkpointed feature table computes the misclassified-row update
    * sums (margin with the PREVIOUS round's weights ≤ 0), the driver
    * adds 5 longs, and a second aggregate evaluates the NEW weights on
    * the heldout split. Two passes per round is the didactic form; a
    * pipelined variant folds round t's eval into round t+1's update
    * pass — same asymptotics, one scan per round.
    *
    * Output: (round, updates, w0..w4, held_correct, held_total) — the
    * exact learning trajectory, oracle-replayed in DuckDB as an unrolled
    * CTE chain over the same integer features. */
  def qcPerceptron(spark: SparkSession, d: String): DataFrame = {
    // one materialization; 8 subsequent tiny scans read this, not the
    // parquet + feature pipeline
    val f = features(spark, d).localCheckpoint()
    var w = Array.fill(dims)(0L)
    val rows = (1 to 4).map { t =>
      val m = margin(w)
      val upd = f.agg(
        count(when(col("is_train") && m <= 0, 1)).as("upd"),
        (0 until dims).map(i =>
          sum(when(col("is_train") && m <= 0, col("y") * col(s"x$i"))).as(s"d$i")): _*).head
      w = Array.tabulate(dims)(i =>
        w(i) + (if (upd.isNullAt(i + 1)) 0L else upd.getLong(i + 1)))
      val m2 = margin(w)
      val ev = f.filter(!col("is_train"))
        .agg(count(when(m2 > 0, 1)).as("c"), count(lit(1)).as("n")).head
      Row(t.toLong, upd.getLong(0), w(0), w(1), w(2), w(3), w(4),
        ev.getLong(0), ev.getLong(1))
    }
    val schema = StructType(
      Seq("round", "updates", "w0", "w1", "w2", "w3", "w4",
        "held_correct", "held_total").map(StructField(_, LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy("round")
  }

  /** Train on a scale dir and hand back the weights — the artifact a
    * serving path (e.g. [[graft.streaming.StreamingClassifier]]) ships
    * into [[scoreExpr]]. */
  def train(spark: SparkSession, d: String): Array[Long] =
    trainedWeights(features(spark, d).localCheckpoint())

  /** Runs the training loop (same aggregates as [[qcPerceptron]], minus
    * the per-round eval leg) and returns the post-round-4 weights. */
  private def trainedWeights(f: DataFrame): Array[Long] = {
    var w = Array.fill(dims)(0L)
    (1 to 4).foreach { _ =>
      val m = margin(w)
      val upd = f.agg(
        count(when(col("is_train") && m <= 0, 1)).as("upd"),
        (0 until dims).map(i =>
          sum(when(col("is_train") && m <= 0, col("y") * col(s"x$i"))).as(s"d$i")): _*).head
      w = Array.tabulate(dims)(i =>
        w(i) + (if (upd.isNullAt(i + 1)) 0L else upd.getLong(i + 1)))
    }
    w
  }

  /** QC2 — the INFERENCE half of the probe story: sweep the trained
    * scorer across the whole corpus (train + heldout) and report the
    * score distribution as an exact decile table — per decile: doc
    * count, how many are actually English, and the score range. This is
    * the report a curation pipeline emits before picking a filter
    * threshold ("decile 10 is 95% English — cut below decile 7").
    *
    * The model applies as five literal multiplications per row (weights
    * are plan constants — the broadcast-back leg of the parameter-server
    * shape), so the sweep is one codegen'd scan. Deciles use the q44
    * device — value-range buckets + local windows + closed-form ntile —
    * because a literal `ntile(10) OVER (ORDER BY s)` funnels 100 TB
    * through one task. Integer scores keep every decile boundary
    * bit-identical to the oracle's native NTILE replay. */
  def qcScoreSweep(spark: SparkSession, d: String): DataFrame = {
    val f = features(spark, d).localCheckpoint()
    val w = trainedWeights(f)
    val score = (0 until dims).map(i => lit(w(i)) * col(s"x$i")).reduce(_ + _)
    val scored = f.select(col("doc_id"), col("y"), score.as("s"))
    val nb = 32  // range buckets carrying the distributed rank
    val n = 10   // deciles
    val stats = scored.agg(
      min("s").as("mn"), max("s").as("mx"), count(lit(1)).as("total"))
    val base = scored.join(broadcast(stats))
      .withColumn("pid",
        (((col("s") - col("mn")) * nb) / (col("mx") - col("mn") + 1L)).cast("int"))
    val wLocal = Window.partitionBy("pid").orderBy("s", "doc_id")
    val offsets = base.groupBy("pid").agg(count(lit(1)).as("pcnt"))
      .filter(col("pid") < nb - 1)
      .select(explode(sequence(col("pid") + 1, lit(nb - 1))).as("pid"), col("pcnt"))
      .groupBy("pid").agg(sum("pcnt").as("off"))
    // SQL NTILE closed-form in (rank, N): first N mod n buckets take
    // ⌈N/n⌉ rows, the rest ⌊N/n⌋ (the q44-verified formulation)
    val big = floor(col("total").cast("double") / n).cast("long") + 1L
    val rem = col("total") % n
    def idiv(a: Column, b: Column): Column =
      floor(a.cast("double") / b.cast("double")).cast("long")
    base
      .join(broadcast(offsets), Seq("pid"), "left")
      .withColumn("r", row_number().over(wLocal).cast("long") + coalesce(col("off"), lit(0L)))
      .withColumn("decile",
        when(col("r") <= rem * big, idiv(col("r") - 1, big) + 1)
          // total < n ⇒ big = 1 and the first branch already covers every
          // row (r ≤ rem·big = total); this arm makes the big−1 division
          // below unreachable-by-construction instead of merely
          // unreached (CaseWhen is lazy, but don't lean on it)
          .when(big === 1L, col("r"))
          .otherwise(rem + idiv(col("r") - rem * big - 1, big - 1) + 1))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("y") === 1, 1)).as("n_en"),
        min("s").as("min_score"), max("s").as("max_score"))
      .orderBy("decile")
  }

  /** QC3 — the EVALUATION leg: exact ROC-AUC of the trained scorer on
    * the heldout split, via the Mann–Whitney rank identity with full
    * tie correction. AUC = [Σ_pos avgrank − P(P+1)/2] / (P·N); with
    * ties taking the average rank, twice the numerator is the integer
    * Σ over distinct scores of cp·(2·rmin + c − 1) − P(P+1), where
    * rmin is the competition rank (1 + count of strictly-smaller rows).
    * Everything up to the final division is BIGINT, so the oracle
    * replays it exactly, and the one double division runs on identical
    * inputs in identical order on both engines.
    *
    * Scale shape: rows collapse to the distinct-score table FIRST
    * (groupBy — partial-aggregable), and the prefix count of smaller
    * scores uses the q44 range-bucket device over that table — local
    * windows per bucket + tiny offset join — never a global window.
    * The result is three longs; the driver finishes with arithmetic. */
  def qcAuc(spark: SparkSession, d: String): DataFrame = {
    val f = features(spark, d).localCheckpoint()
    val w = trainedWeights(f)
    val score = (0 until dims).map(i => lit(w(i)) * col(s"x$i")).reduce(_ + _)
    val g = f.filter(!col("is_train")).select(col("y"), score.as("s"))
      .groupBy("s").agg(count(lit(1)).as("c"),
        count(when(col("y") === 1, 1)).as("cp"))
    val nb = 32
    val stats = g.agg(min("s").as("mn"), max("s").as("mx"))
    val b = g.join(broadcast(stats))
      .withColumn("pid",
        (((col("s") - col("mn")) * nb) / (col("mx") - col("mn") + 1L)).cast("int"))
    val offsets = b.groupBy("pid").agg(sum("c").as("pcnt"))
      .filter(col("pid") < nb - 1)
      .select(explode(sequence(col("pid") + 1, lit(nb - 1))).as("pid"), col("pcnt"))
      .groupBy("pid").agg(sum("pcnt").as("off"))
    val wLocal = Window.partitionBy("pid").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = b.join(broadcast(offsets), Seq("pid"), "left")
      .withColumn("rmin",
        lit(1L) + coalesce(sum("c").over(wLocal), lit(0L)) + coalesce(col("off"), lit(0L)))
      .agg(sum("cp").as("p"), sum(col("c") - col("cp")).as("nn"),
        sum(col("cp") * (lit(2L) * col("rmin") + col("c") - 1L)).as("m")).head
    val (p, nn, m) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    val num2 = m - p * (p + 1)
    // a single-class heldout split makes AUC undefined (0/0); pin the
    // conventional 0.5 instead of letting NaN/Inf leak into the hash —
    // the oracle mirrors the same CASE
    val auc = if (p == 0L || nn == 0L) 0.5
      else num2.toDouble / (2.0 * p.toDouble * nn.toDouble)
    val schema = StructType(Seq(
      StructField("p", LongType, nullable = false),
      StructField("n_neg", LongType, nullable = false),
      StructField("auc_num2", LongType, nullable = false),
      StructField("auc", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(p, nn, num2, auc)), 1), schema)
  }

  /** QC4 — heldout confusion matrix at the perceptron's natural
    * decision boundary (predict positive iff s > 0), with
    * precision/recall/F1. The counts are ONE map-side-combinable
    * aggregate; the three ratios are derived driver-side from the four
    * longs in a fixed expression order, so the doubles are bit-equal to
    * the oracle's replay of the same divisions. */
  def qcConfusion(spark: SparkSession, d: String): DataFrame = {
    val f = features(spark, d).localCheckpoint()
    val w = trainedWeights(f)
    val s = (0 until dims).map(i => lit(w(i)) * col(s"x$i")).reduce(_ + _)
    val r = f.filter(!col("is_train")).agg(
      count(when(col("y") === 1 && s > 0, 1)).as("tp"),
      count(when(col("y") === -1 && s > 0, 1)).as("fp"),
      count(when(col("y") === 1 && s <= 0, 1)).as("fn"),
      count(when(col("y") === -1 && s <= 0, 1)).as("tn")).head
    val (tp, fp, fn, tn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // tp = 0 collapses every ratio to the 0/0 family; the standard
    // convention (precision = recall = F1 = 0) keeps the row NaN-free
    // and hash-stable in both engines
    val precision = if (tp == 0L) 0.0 else tp.toDouble / (tp + fp).toDouble
    val recall = if (tp == 0L) 0.0 else tp.toDouble / (tp + fn).toDouble
    val f1 = if (tp == 0L) 0.0 else 2.0 * precision * recall / (precision + recall)
    val schema = StructType(
      Seq("tp", "fp", "fn", "tn").map(StructField(_, LongType, nullable = false)) ++
      Seq("precision", "recall", "f1").map(StructField(_, DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(tp, fp, fn, tn, precision, recall, f1)), 1), schema)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qc_perceptron" -> qcPerceptron _,
    "qc_score_sweep" -> qcScoreSweep _,
    "qc_auc" -> qcAuc _,
    "qc_confusion" -> qcConfusion _)

  // the oracle unrolls the same four rounds as a CTE chain: w{t} holds
  // the post-round weights + update count, s{t} the per-row margins
  // under w{t}, e{t} the heldout confusion under w{t}. Every CTE is
  // MATERIALIZED: DuckDB's default inlining would re-expand the chain at
  // every reference — s4 inlines w4 inlines six copies of s3, and so on
  // — turning a 4-round replay into an exponential plan (measured: >100 s
  // at sf0.001 inlined vs 0.45 s at sf0.01 materialized).
  private val oracleF =
    "f AS MATERIALIZED (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y, " +
      "CAST(1 AS BIGINT) AS x0, " +
      "CAST(len(string_split(text, ' ')) AS BIGINT) AS x1, " +
      "CAST(len(list_filter(string_split(text, ' '), " +
      "w -> w IN ('the', 'a', 'of', 'to', 'and'))) AS BIGINT) AS x2, " +
      "CAST((length(text) - length(replace(text, 'th', ''))) / 2 AS BIGINT) AS x3, " +
      "CAST((length(text) - length(replace(text, 'de ', ''))) / 3 AS BIGINT) AS x4, " +
      "doc_id % 2 = 0 AS is_train FROM documents)"

  private def oracleScore(t: Int): String =
    s"s$t AS MATERIALIZED (SELECT y, x0, x1, x2, x3, x4, is_train, " +
      s"y * ((SELECT s0 FROM w$t) * x0 + (SELECT s1 FROM w$t) * x1 + " +
      s"(SELECT s2 FROM w$t) * x2 + (SELECT s3 FROM w$t) * x3 + " +
      s"(SELECT s4 FROM w$t) * x4) AS m FROM f), " +
      s"e$t AS MATERIALIZED (SELECT CAST(COUNT(CASE WHEN m > 0 THEN 1 END) AS BIGINT) AS c, " +
      s"CAST(COUNT(*) AS BIGINT) AS n FROM s$t WHERE NOT is_train)"

  private def oracleStep(t: Int): String = {
    val p = t - 1
    s"w$t AS MATERIALIZED (SELECT " +
      (0 until dims).map(i =>
        s"(SELECT s$i FROM w$p) + CAST(COALESCE(SUM(CASE WHEN m <= 0 " +
          s"THEN y * x$i END), 0) AS BIGINT) AS s$i").mkString(", ") +
      s", CAST(COUNT(CASE WHEN m <= 0 THEN 1 END) AS BIGINT) AS upd " +
      s"FROM s$p WHERE is_train)"
  }

  private def oracleRow(t: Int): String =
    s"SELECT CAST($t AS BIGINT) AS round, (SELECT upd FROM w$t) AS updates, " +
      (0 until dims).map(i => s"(SELECT s$i FROM w$t) AS w$i").mkString(", ") +
      s", (SELECT c FROM e$t) AS held_correct, (SELECT n FROM e$t) AS held_total"

  // round 1: zero weights mean every training row is misclassified
  private val oracleW1 =
    "w1 AS MATERIALIZED (SELECT " +
      (0 until dims).map(i =>
        s"CAST(SUM(y * x$i) AS BIGINT) AS s$i").mkString(", ") +
      ", CAST(COUNT(*) AS BIGINT) AS upd FROM f WHERE is_train)"

  private val oracleChain =
    "WITH " + oracleF + ", " + oracleW1 + ", " +
      Seq(oracleScore(1), oracleStep(2), oracleScore(2), oracleStep(3),
        oracleScore(3), oracleStep(4), oracleScore(4)).mkString(", ")

  val oracles: Map[String, String] = Map(
    "qc_perceptron" -> (oracleChain + " " +
      (1 to 4).map(oracleRow).mkString(" UNION ALL ") +
      " ORDER BY round"),
    // the sweep oracle scores f under w4 and replays the decile table
    // with DuckDB's native NTILE (the single-task form the Spark side
    // deliberately avoids), tie-broken identically by (s, doc_id)
    "qc_score_sweep" -> (oracleChain + ", " +
      "sc AS MATERIALIZED (SELECT doc_id, y, " +
      (0 until dims).map(i => s"(SELECT s$i FROM w4) * x$i").mkString(" + ") +
      " AS s FROM f), " +
      "dec AS (SELECT y, s, NTILE(10) OVER (ORDER BY s, doc_id) AS decile FROM sc) " +
      "SELECT CAST(decile AS BIGINT) AS decile, " +
      "CAST(COUNT(*) AS BIGINT) AS n_docs, " +
      "CAST(COUNT(CASE WHEN y = 1 THEN 1 END) AS BIGINT) AS n_en, " +
      "MIN(s) AS min_score, MAX(s) AS max_score " +
      "FROM dec GROUP BY decile ORDER BY decile"),
    // Mann–Whitney with tie correction over the heldout scores; the
    // prefix sum runs over the DISTINCT-score table, so a plain window
    // is fine here in the oracle while the Spark side stays bucketed
    "qc_auc" -> (oracleChain + ", " +
      "sh AS MATERIALIZED (SELECT y, " +
      (0 until dims).map(i => s"(SELECT s$i FROM w4) * x$i").mkString(" + ") +
      " AS s FROM f WHERE NOT is_train), " +
      "g AS MATERIALIZED (SELECT s, CAST(COUNT(*) AS BIGINT) AS c, " +
      "CAST(COUNT(CASE WHEN y = 1 THEN 1 END) AS BIGINT) AS cp FROM sh GROUP BY s), " +
      "r AS MATERIALIZED (SELECT cp, c, 1 + CAST(COALESCE(SUM(c) OVER " +
      "(ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS rmin FROM g), " +
      "t AS (SELECT CAST(SUM(cp) AS BIGINT) AS p, CAST(SUM(c - cp) AS BIGINT) AS nn, " +
      "CAST(SUM(cp * (2 * rmin + c - 1)) AS BIGINT) AS m FROM r) " +
      "SELECT p, nn AS n_neg, m - p * (p + 1) AS auc_num2, " +
      "CASE WHEN p = 0 OR nn = 0 THEN 0.5 ELSE " +
      "CAST(m - p * (p + 1) AS DOUBLE) / (2.0 * CAST(p AS DOUBLE) * CAST(nn AS DOUBLE)) END AS auc " +
      "FROM t"),
    "qc_confusion" -> (oracleChain + ", " +
      "sh AS MATERIALIZED (SELECT y, " +
      (0 until dims).map(i => s"(SELECT s$i FROM w4) * x$i").mkString(" + ") +
      " AS s FROM f WHERE NOT is_train), " +
      "cm AS (SELECT " +
      "CAST(COUNT(CASE WHEN y = 1 AND s > 0 THEN 1 END) AS BIGINT) AS tp, " +
      "CAST(COUNT(CASE WHEN y = -1 AND s > 0 THEN 1 END) AS BIGINT) AS fp, " +
      "CAST(COUNT(CASE WHEN y = 1 AND s <= 0 THEN 1 END) AS BIGINT) AS fn, " +
      "CAST(COUNT(CASE WHEN y = -1 AND s <= 0 THEN 1 END) AS BIGINT) AS tn FROM sh), " +
      "pr AS (SELECT tp, fp, fn, tn, " +
      "CASE WHEN tp = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision, " +
      "CASE WHEN tp = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall FROM cm) " +
      "SELECT tp, fp, fn, tn, precision, recall, " +
      "CASE WHEN tp = 0 THEN 0.0 ELSE 2.0 * precision * recall / (precision + recall) END AS f1 FROM pr"))
}
