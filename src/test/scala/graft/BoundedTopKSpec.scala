package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class BoundedTopKSpec extends SparkSpec {
  import spark.implicits._

  test("topk_pairs aggregate == window row_number top-k on real orders") {
    val viaAgg = SparkEntry.queries("q34_topk_agg")(spark, sfTiny)
      .collect().map(_.toString).toSeq
    val viaWindow = SparkEntry.queries("q8_topk_per_group")(spark, sfTiny)
      .collect().map(_.toString).toSeq
    assert(viaAgg == viaWindow)
  }

  test("heap result is partition-invariant (partial/merge path exercised)") {
    GraftFunctions.ensureRegistered(spark)
    val df = (1 to 1000)
      .map(i => ((i % 7).toLong, (i * 37 % 101).toDouble, i.toLong))
      .toDF("g", "s", "i")
    def run(d: DataFrame): Seq[String] =
      d.groupBy("g").agg(expr("topk_pairs(s, i, 5)").as("t"))
        .orderBy("g").collect().map(_.toString).toSeq
    assert(run(df.coalesce(1)) == run(df.repartition(13)))
  }

  test("ties rank by smaller id; k bounds the result; short groups keep all") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (1L, 5.0, 3L), (1L, 5.0, 2L), (1L, 4.0, 1L), (1L, 5.0, 9L),
      (2L, 1.0, 7L))
      .toDF("g", "s", "i")
    val got = df.groupBy("g").agg(expr("topk_pairs(s, i, 2)").as("t"))
      .selectExpr("g", "transform(t, e -> e.id) AS ids")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(2L, 3L), s"tie order wrong: ${got(1L)}")
    assert(got(2L) == Seq(7L))
  }

  test("null scores are skipped, not ranked") {
    GraftFunctions.ensureRegistered(spark)
    val got = Seq((1L, Some(3.0), 1L), (1L, None, 2L), (1L, Some(5.0), 3L))
      .toDF("g", "s", "i")
      .groupBy("g").agg(expr("topk_pairs(s, i, 3)").as("t"))
      .selectExpr("transform(t, e -> e.id) AS ids")
      .collect().head.getSeq[Long](0)
    assert(got == Seq(3L, 1L))
  }
}
