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

  test("q20: limit plans as TakeOrderedAndProject (no global sort materialization)") {
    val plan = RelationalExt.q20Limit(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"unexpected plan:\n$plan")
  }

  test("q18: non-empty at oracle SF") {
    assert(RelationalExt.q18Except(spark, sfSmall).limit(1).count() == 1)
  }
}
