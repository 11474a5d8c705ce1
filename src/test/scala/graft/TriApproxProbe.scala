package graft

import org.apache.spark.sql.functions.col
import graft.operators.Graph
import graft.sources.Tables

/** Scratch probe: realized DOULION error across seeds/SFs (dev aid for
  * pinning the qg_triangles_approx certificate bound). */
object TriApproxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val edges = Tables.orders(spark, sf)
        .select(col("o_custkey").as("src"),
          ((col("o_orderkey") * 7) % 1500 + 1).as("dst"))
      val exact = Graph.triangleStats(edges).collect().head.getLong(3)
      for (seed <- Seq(42L, 7L, 99L)) {
        val r = Graph.triangleStatsApprox(edges, "80", seed).collect().head
        val est = r.getLong(1)
        println(f"PROBE sf=$sf seed=$seed exact=$exact est=$est relerr=${math.abs(est - exact).toDouble / exact}%.4f")
      }
    }
  }
}
