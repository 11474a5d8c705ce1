package graft

import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.sources._
import graft.sources.FilterSql

/** The V1-filter → SQL renderer behind SQL DELETE
  * ([[graft.sources.FilterSql]]), pinned semantically: every
  * translatable shape filters a sample frame exactly as the native
  * Column predicate would — including null rows, quote/backslash
  * injection in string literals, and the untranslatable set answering
  * None (the loud path). */
class FilterSqlSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq[(String, java.lang.Long)](
    ("alpha", 1L), ("be'ta", 2L), ("ga\\mma", 3L), ("delta", 4L),
    (null, 5L), ("epsilon", null)).toDF("k", "v")

  /** Rows surviving the RENDERED predicate must equal those surviving
    * the native Column expression. */
  private def parity(f: Filter, native: org.apache.spark.sql.Column): Unit = {
    val sql = FilterSql.render(f).getOrElse(fail(s"untranslatable: $f"))
    val got = df.filter(expr(sql)).collect().map(_.toSeq).toSet
    val want = df.filter(native).collect().map(_.toSeq).toSet
    assert(got == want, s"$f rendered '$sql': $got vs $want")
  }

  test("comparisons, null checks, and boolean combinators filter identically") {
    import org.apache.spark.sql.functions.col
    parity(EqualTo("v", 2L), col("v") === 2L)
    parity(GreaterThan("v", 2L), col("v") > 2L)
    parity(GreaterThanOrEqual("v", 4L), col("v") >= 4L)
    parity(LessThan("v", 3L), col("v") < 3L)
    parity(LessThanOrEqual("v", 1L), col("v") <= 1L)
    parity(In("v", Array(1L, 4L)), col("v").isin(1L, 4L))
    parity(In("v", Array.empty[Any]), org.apache.spark.sql.functions.lit(false))
    parity(IsNull("k"), col("k").isNull)
    parity(IsNotNull("v"), col("v").isNotNull)
    parity(Not(EqualTo("v", 2L)), !(col("v") === 2L))
    parity(And(GreaterThan("v", 1L), LessThan("v", 4L)),
      col("v") > 1L && col("v") < 4L)
    parity(Or(EqualTo("v", 1L), EqualTo("v", 5L)),
      col("v") === 1L || col("v") === 5L)
    parity(AlwaysTrue(), org.apache.spark.sql.functions.lit(true))
    parity(AlwaysFalse(), org.apache.spark.sql.functions.lit(false))
    parity(EqualNullSafe("k", null), col("k").isNull)
  }

  test("string literals survive quote and backslash injection") {
    import org.apache.spark.sql.functions.col
    parity(EqualTo("k", "be'ta"), col("k") === "be'ta")
    parity(EqualTo("k", "ga\\mma"), col("k") === "ga\\mma")
    parity(In("k", Array[Any]("alpha", "be'ta")), col("k").isin("alpha", "be'ta"))
    // = NULL never matches; <=> NULL is the IS NULL form
    parity(EqualNullSafe("k", "alpha"), col("k") <=> "alpha")
  }

  test("the untranslatable set answers None, never a guess") {
    assert(FilterSql.render(StringStartsWith("k", "al")).isEmpty)
    assert(FilterSql.render(StringEndsWith("k", "ta")).isEmpty)
    assert(FilterSql.render(StringContains("k", "lph")).isEmpty)
    assert(FilterSql.render(EqualTo("v", Double.NaN)).isEmpty)
    assert(FilterSql.render(EqualTo("v", Double.PositiveInfinity)).isEmpty)
    assert(FilterSql.render(EqualTo("v", null)).isEmpty)
    assert(FilterSql.render(In("v", Array[Any](1L, null))).isEmpty)
    assert(FilterSql.render(
      And(EqualTo("v", 1L), StringContains("k", "x"))).isEmpty,
      "one untranslatable conjunct poisons the whole filter")
  }

  test("temporal and decimal literals render as typed SQL") {
    val d = java.sql.Date.valueOf("2026-02-03")
    val t = java.sql.Timestamp.valueOf("2026-02-03 04:05:06.789")
    assert(FilterSql.render(EqualTo("c", d)).contains("`c` = DATE'2026-02-03'"))
    assert(FilterSql.render(GreaterThan("c", t))
      .contains("`c` > TIMESTAMP'2026-02-03 04:05:06.789'"))
    assert(FilterSql.render(EqualTo("c", new java.math.BigDecimal("12.50")))
      .contains("`c` = 12.50BD"))
  }
}
