package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Skew mitigation primitives (SURVEY.md §7.4 "100 TB design
  * discipline").
  *
  * Scope note: for associative aggregates (count/sum/min/max) skew is
  * already defused by map-side partial aggregation — the hot key reaches
  * the shuffle as one partial row per map task. Salting earns its keep in
  * the two shapes that DON'T combine map-side: exact distinct counting,
  * and joins where one fact key floods a single reducer. AQE's skew-join
  * split covers shuffle joins at runtime; [[saltedJoin]] is for when the
  * build side must be replicated instead.
  */
object Skew {

  /** Exact COUNT(DISTINCT value) per key, decomposed so no single reducer
    * sees all of a hot key's rows: stage 1 groups on (key, hash(value)
    * mod salts) — each distinct value deterministically lands in exactly
    * one salt bucket, so per-bucket distinct counts are disjoint — stage
    * 2 sums them. Identical to the direct countDistinct (SkewSpec), but
    * the hot key's state is spread over `salts` reducers.
    */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
                          salts: Int = 16): DataFrame =
    df.groupBy(col(key), pmod(hash(col(valueCol)), lit(salts)).as("_salt"))
      .agg(countDistinct(col(valueCol)).as("_d"))
      .groupBy(col(key))
      .agg(sum("_d").as("distinct_cnt"))

  /** Salted replicated join for a skewed fact side against a dimension
    * that is too large to broadcast but small enough to replicate
    * `salts`×: the fact side gets a per-row salt, the dimension is
    * exploded across every salt, so the hot key's rows spread over
    * `salts` reducers and each still finds its dimension row.
    *
    * The salt mixes a row-content hash with the row's physical position
    * (`monotonically_increasing_id` = partition id ‖ in-partition index):
    * a content-only hash sends byte-identical duplicate fact rows — the
    * most common hot-key shape — all to ONE salt bucket, silently
    * degrading to an unsalted join. The positional part spreads exact
    * duplicates too. Salt choice never affects the RESULT (the dimension
    * is replicated across every salt, so a row matches its dim row under
    * any salt value); it only shapes the distribution, so positional
    * nondeterminism under AQE replans is harmless.
    */
  /** The fact-side salt of [[saltedJoin]] (exposed for tests): row-content
    * hash mixed with the row's physical position. */
  private[graft] def factSalt(fact: DataFrame, salts: Int) =
    pmod(hash((fact.columns.map(col).toIndexedSeq :+ monotonically_increasing_id()): _*),
      lit(salts))

  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_fsalt", factSalt(fact, salts))
    val repDim = dim.withColumn("_dsalt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(repDim,
      saltedFact(factKey) === repDim(dimKey) &&
        saltedFact("_fsalt") === repDim("_dsalt"))
      .drop("_fsalt", "_dsalt")
  }

  /** QA-SKEW-JOIN — the salted replicated join end-to-end under the
    * oracle gate, on a PLANTED Zipf key: three quarters of lineitem
    * collapses onto key 1 (the one-reducer flood that stalls an
    * unsalted shuffle join at 100 TB), the dimension is the full orders
    * key space (too many rows to broadcast in spirit). The salted plan
    * spreads the hot key over 8 reducers while the DuckDB oracle runs
    * the PLAIN join — the hash match IS the salted ≡ plain proof,
    * cross-engine. Quantities sum as BIGINTs (order-free exactness);
    * SkewSpec pins the plan shape (salt condition present, hot rows
    * really spread over >1 salt bucket). */
  def qaSkewJoin(spark: SparkSession, d: String): DataFrame = {
    val fact = Tables.lineitem(spark, d).select(
      when(pmod(col("l_orderkey"), lit(4)) < 3, lit(1L))
        .otherwise(col("l_orderkey")).as("k"),
      col("l_quantity"))
    val dim = Tables.orders(spark, d)
      .select(col("o_orderkey").as("dk"), col("o_custkey"))
    saltedJoin(fact, dim, "k", "dk", salts = 8)
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("qty"),
        max("o_custkey").as("max_cust"))
      .orderBy("k")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qa_skew_join" -> qaSkewJoin _)

  /** The oracle replays the UNSALTED join — matching it is the whole
    * point (salt never changes the result, only the distribution). */
  val oracles: Map[String, String] = Map(
    "qa_skew_join" ->
      ("WITH f AS (SELECT CASE WHEN l_orderkey % 4 < 3 THEN 1 " +
        "ELSE l_orderkey END AS k, CAST(l_quantity AS BIGINT) AS q " +
        "FROM lineitem), " +
        "d AS (SELECT o_orderkey AS dk, o_custkey FROM orders) " +
        "SELECT k, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS qty, " +
        "MAX(o_custkey) AS max_cust " +
        "FROM f JOIN d ON f.k = d.dk GROUP BY k ORDER BY k"))
}
