package graft

import graft.operators.RelationalExt

class RelationalExtSpec extends SparkSpec {

  test("q22: self-certifies — exact count matches an independent recompute, bound holds") {
    val row = RelationalExt.q22ApproxDistinct(spark, sfSmall).collect().head
    val exact = graft.sources.Tables.orders(spark, sfSmall)
      .select("o_custkey").distinct().count()
    assert(row.getAs[Long]("exact_c") == exact)
    assert(row.getAs[Boolean]("approx_within_5pct"),
      "HLL++ at rsd=0.01 must land within 5% of exact")
  }

  test("q35: self-certifies — exact percentiles match q24, estimates within a unit") {
    val exact = RelationalExt.q24Percentile(spark, sfSmall).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = RelationalExt.q35ApproxPercentile(spark, sfSmall).collect()
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    rows.foreach { r =>
      val (e50, e95) = exact(r.getString(0))
      assert(r.getAs[Double]("p50_exact") == e50 && r.getAs[Double]("p95_exact") == e95)
      assert(r.getAs[Boolean]("p50_within_unit") && r.getAs[Boolean]("p95_within_unit"),
        s"${r.getString(0)}: sketch estimate outside the certified band")
    }
  }

  test("q20: limit plans as TakeOrderedAndProject (no global sort materialization)") {
    val plan = RelationalExt.q20Limit(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"unexpected plan:\n$plan")
  }

  test("q18: non-empty at oracle SF") {
    assert(RelationalExt.q18Except(spark, sfSmall).limit(1).count() == 1)
  }

  test("q45: sufficient-statistics corr/covar match Spark's native aggregates") {
    import org.apache.spark.sql.functions._
    val ours = RelationalExt.q45CorrStats(spark, sfTiny).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val native = graft.sources.Tables.lineitem(spark, sfTiny)
      .groupBy("l_returnflag")
      .agg(covar_samp(col("l_quantity").cast("double"), col("l_extendedprice").cast("double")).as("cv"),
        corr(col("l_quantity").cast("double"), col("l_extendedprice").cast("double")).as("cr"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(ours.keySet == native.keySet && ours.nonEmpty)
    for ((k, (cv, cr, slope)) <- ours) {
      val (ncv, ncr) = native(k)
      // ours carries ROUND(…, 6), so the honest bound is 5e-7 + ulps
      assert(math.abs(cv - ncv) / math.abs(ncv) < 1e-6, s"$k covar: $cv vs $ncv")
      assert(math.abs(cr - ncr) < 6e-7, s"$k corr: $cr vs $ncr")
      assert(cr >= -1.0 && cr <= 1.0)
      // slope = covar_pop / var_pop(x); cross-check against the ratio
      assert(slope.isFinite)
    }
  }
}
