package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import scala.util.Random

/** Differential fuzzing over the relational surface: 120 seeded-random
  * plans (scan / filter / join / group / aggregate / distinct), each
  * built SIMULTANEOUSLY as a DataFrame program and an equivalent ANSI SQL
  * string from one AST, executed both ways, compared as sorted multisets.
  *
  * This generalizes SqlParitySpec's 30 hand-written pairs to a random
  * family: any drift between the two front-ends (aliasing, null
  * semantics, type widening, join column resolution) fails a case with
  * its seed in the name for replay. The generated SQL deliberately stays
  * inside the ANSI subset DuckDB parses too, so the same strings can
  * drive a cross-engine oracle where that engine is available (the
  * driver's t2 harness); in-JVM the differential is DataFrame-vs-SQL.
  *
  * Determinism: results are compared as SORTED row-string multisets, so
  * no generated query needs a total ORDER BY (ties would make row order
  * engine-plan-dependent).
  */
class FuzzParitySpec extends SparkSpec {

  private case class Tbl(name: String, nums: Seq[String], strs: Seq[String])
  private val tbls = Seq(
    Tbl("orders", Seq("o_orderkey", "o_custkey"), Seq("o_orderstatus", "o_orderpriority")),
    Tbl("customer", Seq("c_custkey", "c_nationkey"), Seq.empty),
    Tbl("lineitem", Seq("l_orderkey", "l_linenumber", "l_quantity"),
      Seq("l_returnflag", "l_linestatus")),
    Tbl("supplier", Seq("s_suppkey", "s_nationkey"), Seq.empty))

  /** Joinable pairs: (left tbl index, right tbl index, left key, right key).
    * TPC-H column prefixes keep all names disjoint, so no qualification
    * is needed on either side. */
  private val joinPairs = Seq(
    (0, 1, "o_custkey", "c_custkey"),
    (2, 0, "l_orderkey", "o_orderkey"),
    (1, 3, "c_nationkey", "s_nationkey"))

  private case class Pred(sql: String, c: Column)

  private def genPred(rng: Random, t: Tbl): Option[Pred] =
    if (rng.nextDouble() < 0.25) None
    else if (t.strs.nonEmpty && rng.nextDouble() < 0.4) {
      val c = t.strs(rng.nextInt(t.strs.size))
      val ch = ('a' + rng.nextInt(26)).toChar
      Some(Pred(s"$c LIKE '%$ch%'", col(c).like(s"%$ch%")))
    } else {
      val c = t.nums(rng.nextInt(t.nums.size))
      rng.nextInt(3) match {
        case 0 =>
          val m = 2 + rng.nextInt(9); val r = rng.nextInt(m)
          Some(Pred(s"$c % $m = $r", col(c) % m === r))
        case 1 =>
          val v = rng.nextInt(2000)
          Some(Pred(s"$c > $v", col(c) > v))
        case _ =>
          val v = rng.nextInt(2000)
          Some(Pred(s"$c <= $v", col(c) <= v))
      }
    }

  /** One aggregate: (alias, DataFrame column, SQL text). */
  private def genAgg(rng: Random, nums: Seq[String], i: Int): (String, Column, String) = {
    val a = s"a$i"
    val c = nums(rng.nextInt(nums.size))
    rng.nextInt(6) match {
      case 0 => (a, count(lit(1)).as(a), s"COUNT(*) AS $a")
      case 1 => (a, sum(col(c)).as(a), s"SUM($c) AS $a")
      case 2 => (a, min(col(c)).as(a), s"MIN($c) AS $a")
      case 3 => (a, max(col(c)).as(a), s"MAX($c) AS $a")
      case 4 => (a, countDistinct(col(c)).as(a), s"COUNT(DISTINCT $c) AS $a")
      case _ => (a, avg(col(c)).as(a), s"AVG($c) AS $a")
    }
  }

  /** Build one (DataFrame, SQL) pair from the case's seed. */
  private def genCase(seed: Int): (DataFrame, String) = {
    val rng = new Random(seed)
    rng.nextInt(4) match {
      case 0 => // scan + filter + projection (maybe DISTINCT)
        val t = tbls(rng.nextInt(tbls.size))
        val pred = genPred(rng, t)
        val all = t.nums ++ t.strs
        val cols = rng.shuffle(all).take(1 + rng.nextInt(all.size)).sorted
        val distinct = rng.nextBoolean()
        var df = spark.table(t.name)
        pred.foreach(p => df = df.filter(p.c))
        df = df.select(cols.map(col): _*)
        if (distinct) df = df.distinct()
        val sql = s"SELECT ${if (distinct) "DISTINCT " else ""}${cols.mkString(", ")} " +
          s"FROM ${t.name}${pred.map(p => s" WHERE ${p.sql}").getOrElse("")}"
        (df, sql)

      case 1 => // groupBy + aggregates
        val t = tbls(rng.nextInt(tbls.size))
        val pred = genPred(rng, t)
        val all = t.strs ++ t.nums
        val keys = rng.shuffle(all).take(1 + rng.nextInt(2)).sorted
        val aggs = (0 until 1 + rng.nextInt(3)).map(genAgg(rng, t.nums, _))
        var df = spark.table(t.name)
        pred.foreach(p => df = df.filter(p.c))
        df = df.groupBy(keys.map(col): _*).agg(aggs.head._2, aggs.tail.map(_._2): _*)
        val sql = s"SELECT ${keys.mkString(", ")}, ${aggs.map(_._3).mkString(", ")} " +
          s"FROM ${t.name}${pred.map(p => s" WHERE ${p.sql}").getOrElse("")} " +
          s"GROUP BY ${keys.mkString(", ")}"
        (df, sql)

      case 2 => // join + filter + groupBy + aggregate
        val (li, ri, lk, rk) = joinPairs(rng.nextInt(joinPairs.size))
        val (lt, rt) = (tbls(li), tbls(ri))
        val pred = genPred(rng, lt)
        val keyPool = lt.strs ++ rt.nums
        val keys = rng.shuffle(keyPool).take(1 + rng.nextInt(2)).sorted
        val aggs = (0 until 1 + rng.nextInt(2)).map(genAgg(rng, lt.nums, _))
        var df = spark.table(lt.name).join(spark.table(rt.name), col(lk) === col(rk))
        pred.foreach(p => df = df.filter(p.c))
        df = df.groupBy(keys.map(col): _*).agg(aggs.head._2, aggs.tail.map(_._2): _*)
        val sql = s"SELECT ${keys.mkString(", ")}, ${aggs.map(_._3).mkString(", ")} " +
          s"FROM ${lt.name} JOIN ${rt.name} ON $lk = $rk" +
          s"${pred.map(p => s" WHERE ${p.sql}").getOrElse("")} " +
          s"GROUP BY ${keys.mkString(", ")}"
        (df, sql)

      case _ => // global aggregate (no GROUP BY; empty input → one null-ish row)
        val t = tbls(rng.nextInt(tbls.size))
        val pred = genPred(rng, t)
        val aggs = (0 until 1 + rng.nextInt(3)).map(genAgg(rng, t.nums, _))
        var df = spark.table(t.name)
        pred.foreach(p => df = df.filter(p.c))
        df = df.agg(aggs.head._2, aggs.tail.map(_._2): _*)
        val sql = s"SELECT ${aggs.map(_._3).mkString(", ")} " +
          s"FROM ${t.name}${pred.map(p => s" WHERE ${p.sql}").getOrElse("")}"
        (df, sql)
    }
  }

  test("120 random plans: DataFrame program == spark.sql of the generated ANSI SQL") {
    Tables.registerAll(spark, sfTiny)
    val failures = (0 until 120).flatMap { i =>
      val seed = 0xF0002 + i
      val (df, sql) = genCase(seed)
      val viaApi = df.collect().map(_.toString).sorted.toSeq
      val viaSql = spark.sql(sql).collect().map(_.toString).sorted.toSeq
      if (viaApi == viaSql) None
      else Some(s"seed=$seed sql=[$sql] first-diff=" +
        viaApi.zipAll(viaSql, "<none>", "<none>").find(p => p._1 != p._2))
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
