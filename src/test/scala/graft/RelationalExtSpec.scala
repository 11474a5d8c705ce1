package graft

import graft.operators.RelationalExt

class RelationalExtSpec extends SparkSpec {

  test("q22: approx_count_distinct within 5% of exact (HLL++ rsd=0.01)") {
    val approx = RelationalExt.q22ApproxDistinct(spark, sfSmall).collect().head.getLong(0)
    val exact = graft.sources.Tables.orders(spark, sfSmall)
      .select("o_custkey").distinct().count()
    assert(exact > 0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("q35: approx_percentile within 2% of the exact percentile per group") {
    val exact = RelationalExt.q24Percentile(spark, sfSmall).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = RelationalExt.q35ApproxPercentile(spark, sfSmall).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (flag, (a50, a95)) =>
      val (e50, e95) = exact(flag)
      assert(math.abs(a50 - e50) <= 0.02 * math.max(1.0, e50), s"$flag p50: $a50 vs $e50")
      assert(math.abs(a95 - e95) <= 0.02 * math.max(1.0, e95), s"$flag p95: $a95 vs $e95")
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
}
