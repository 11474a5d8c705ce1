package graft

import org.apache.spark.sql.functions.col
import graft.sources.Tables

/** Scratch probe: does the hop join reuse the checkpointed edge
  * partitioning (no Exchange above the edge side)? */
object KhopPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val edges = Tables.orders(spark, "/root/testdata/sf0.01")
      .select(col("o_custkey").as("src"),
        ((col("o_orderkey") * 7) % 15000 + 1).as("dst"))
    // no checkpoint dir in tests → cutLineage takes the localCheckpoint
    // branch; replicate it here (cutLineage is private[operators])
    val e = edges.select(col("src").cast("long"), col("dst").cast("long")).distinct()
      .repartition(col("src")).localCheckpoint(true)
    val frontier = e.select(col("src").as("node")).distinct().limit(100)
    val joined = frontier.select(col("node").as("src")).join(e, "src")
    joined.collect()
    println("=== executed plan (final, AQE) ===")
    println(joined.queryExecution.executedPlan.toString.take(4000))
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
