package graft

import org.apache.spark.sql.functions._
import graft.sources.{Bucketing, Tables}

class BucketingSpec extends SparkSpec {

  test("co-bucketed join plans exchange-free (and sort-free) on both sides") {
    Bucketing.writeBucketed(
      Tables.orders(spark, sfTiny).select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", "o_custkey", buckets = 4)
    Bucketing.writeBucketed(
      Tables.customer(spark, sfTiny).select("c_custkey", "c_nationkey"),
      "customer_b", "c_custkey", buckets = 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "customer_b",
        "o_custkey", "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // correctness: same result as the plain parquet join
      val want = Tables.orders(spark, sfTiny)
        .join(Tables.customer(spark, sfTiny),
          col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("aggregation on the bucket key also skips the shuffle") {
    val agg = spark.table("orders_b").groupBy("o_custkey")
      .agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed agg must reuse the table's partitioning:\n$plan")
  }
}
