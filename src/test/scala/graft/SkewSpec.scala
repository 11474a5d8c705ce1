package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Tables

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted distinct count == direct countDistinct on real data") {
    val orders = Tables.orders(spark, sfSmall)
    val salted = Skew.saltedDistinctCount(orders, "o_orderpriority", "o_custkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = orders.groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salted distinct count spreads a pathologically hot key") {
    // one key owns 99% of rows — the shape that stalls a single reducer
    val skewed = ((1 to 5000).map(i => ("hot", i % 700)) ++
      (1 to 50).map(i => ("cold", i))).toDF("k", "v")
    val salted = Skew.saltedDistinctCount(skewed, "k", "v", salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == Map("hot" -> 700L, "cold" -> 50L))
    // stage-1 output really is spread across salt buckets
    val buckets = skewed.filter($"k" === "hot")
      .select(pmod(hash($"v"), lit(8)).as("s")).distinct().count()
    assert(buckets > 1, "salting failed to spread the hot key")
  }

  test("salted join spreads byte-identical duplicate fact rows (the common hot-key shape)") {
    // 4k copies of ONE row: a content-only salt sends them all to a
    // single bucket — the positional mix must spread them, and the join
    // result must still be a full 4k × dim match
    val fact = Seq.fill(4000)(("hot", 1)).toDF("fk", "payload")
      .repartition(8) // several partitions, like a real scan
    val buckets = fact.select(Skew.factSalt(fact, 8).as("s"))
      .distinct().count()
    assert(buckets > 4, s"identical rows landed in only $buckets/8 salt buckets")
    val dim = Seq(("hot", 99)).toDF("dk", "attr")
    assert(Skew.saltedJoin(fact, dim, "fk", "dk", salts = 8).count() == 4000L)
  }

  test("salted join == plain join, with the fact side spread across salts") {
    val fact = Tables.orders(spark, sfTiny).select("o_orderkey", "o_custkey")
    val dim = Tables.customer(spark, sfTiny).select("c_custkey", "c_nationkey")
    val plain = fact.join(dim, col("o_custkey") === col("c_custkey")).count()
    val salted = Skew.saltedJoin(fact, dim, "o_custkey", "c_custkey", salts = 4)
    assert(salted.count() == plain)
    assert(salted.columns.toSeq ==
      Seq("o_orderkey", "o_custkey", "c_custkey", "c_nationkey"))
  }

  test("qa_skew_join: salted plan shape, hot key really spread, result == plain join") {
    val df = Skew.queries("qa_skew_join")(spark, sfTiny)
    // the salt condition is IN the executed join (not optimized away)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("_fsalt") && plan.contains("_dsalt"),
      s"salt columns missing from the executed plan:\n$plan")
    assert(plan.contains("Generate") || plan.contains("explode"),
      "dimension replication (explode over salts) missing from the plan")
    // the planted hot key's rows occupy >1 salt bucket — the whole point
    val fact = Tables.lineitem(spark, sfTiny).select(
      when(pmod(col("l_orderkey"), lit(4)) < 3, lit(1L))
        .otherwise(col("l_orderkey")).as("k"),
      col("l_quantity"))
    val hotBuckets = fact.withColumn("s", Skew.factSalt(fact, 8))
      .filter(col("k") === 1L).select("s").distinct().count()
    assert(hotBuckets > 4,
      s"hot key spread over only $hotBuckets/8 salt buckets")
    // salted ≡ plain on the same shape (the oracle proves this
    // cross-engine at sf0.01; this is the in-plan pin at sfTiny)
    val dim = Tables.orders(spark, sfTiny)
      .select(col("o_orderkey").as("dk"), col("o_custkey"))
    val plainAgg = fact.join(dim, col("k") === col("dk"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("qty"),
        max("o_custkey").as("max_cust"))
      .orderBy("k")
      .collect().toSeq
    assert(df.collect().toSeq == plainAgg,
      "salted aggregate must equal the plain-join aggregate row for row")
  }
}
