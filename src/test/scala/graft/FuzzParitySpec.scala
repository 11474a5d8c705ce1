package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import scala.util.Random

/** Differential fuzzing over the relational surface: 330 seeded-random
  * plans over 15 shapes (scan / filter / join / group / aggregate /
  * distinct / sort+limit / window top-k / union-all / set-ops incl. ALL
  * / semi+anti via IN-subquery / rank+lag+running-sum windows / HAVING /
  * CASE WHEN / correlated EXISTS / scalar MIN-MAX subquery / unpivot),
  * each built SIMULTANEOUSLY as a DataFrame program and an
  * equivalent ANSI SQL string from one AST, executed both ways, compared
  * row for row.
  *
  * This generalizes SqlParitySpec's 30 hand-written pairs to a random
  * family: any drift between the two front-ends (aliasing, null
  * semantics, type widening, join column resolution) fails a case with
  * its seed in the name for replay. The generated SQL deliberately stays
  * inside the ANSI subset DuckDB parses too, so the same strings can
  * drive a cross-engine oracle where that engine is available (the
  * driver's t2 harness); in-JVM the differential is DataFrame-vs-SQL.
  *
  * Determinism: unordered shapes are compared as SORTED row-string
  * multisets; the sort+limit shape orders by EVERY projected column
  * (total order up to duplicate rows) and is compared in order.
  */
class FuzzParitySpec extends SparkSpec {

  /** `intNums` ⊆ `nums`: the integer-typed columns safe for SUM/AVG
    * (l_quantity is double — order-dependent accumulation). */
  private case class Tbl(name: String, nums: Seq[String], intNums: Seq[String],
                         strs: Seq[String], uniqueKey: String)
  private val tbls = Seq(
    Tbl("orders", Seq("o_orderkey", "o_custkey"), Seq("o_orderkey", "o_custkey"),
      Seq("o_orderstatus", "o_orderpriority"), "o_orderkey"),
    Tbl("customer", Seq("c_custkey", "c_nationkey"), Seq("c_custkey", "c_nationkey"),
      Seq.empty, "c_custkey"),
    Tbl("lineitem", Seq("l_orderkey", "l_linenumber", "l_quantity"),
      Seq("l_orderkey", "l_linenumber"),
      Seq("l_returnflag", "l_linestatus"), "l_orderkey"),
    Tbl("supplier", Seq("s_suppkey", "s_nationkey"), Seq("s_suppkey", "s_nationkey"),
      Seq.empty, "s_suppkey"))

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

  /** One aggregate: (alias, DataFrame column, SQL text). SUM/AVG draw
    * only from INTEGER-typed columns: a double sum's value depends on
    * accumulation order, so it can drift across engines (and across
    * shuffle-fetch orders) in the last ulps — exactly the false-positive
    * an exact row compare must not be exposed to. MIN/MAX/COUNT are
    * order-independent and may use any numeric column. */
  private def genAgg(rng: Random, nums: Seq[String], intNums: Seq[String],
                     i: Int): (String, Column, String) = {
    val a = s"a$i"
    val c = nums(rng.nextInt(nums.size))
    val ic = intNums(rng.nextInt(intNums.size))
    rng.nextInt(6) match {
      case 0 => (a, count(lit(1)).as(a), s"COUNT(*) AS $a")
      case 1 => (a, sum(col(ic)).as(a), s"SUM($ic) AS $a")
      case 2 => (a, min(col(c)).as(a), s"MIN($c) AS $a")
      case 3 => (a, max(col(c)).as(a), s"MAX($c) AS $a")
      case 4 => (a, countDistinct(col(c)).as(a), s"COUNT(DISTINCT $c) AS $a")
      case _ => (a, avg(col(ic)).as(a), s"AVG($ic) AS $a")
    }
  }

  /** Build one (DataFrame, SQL, orderedCompare) triple from the seed. */
  private def genCase(seed: Int): (DataFrame, String, Boolean) = {
    val rng = new Random(seed)
    rng.nextInt(17) match {
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
        (df, sql, false)

      case 1 => // groupBy + aggregates
        val t = tbls(rng.nextInt(tbls.size))
        val pred = genPred(rng, t)
        val all = t.strs ++ t.nums
        val keys = rng.shuffle(all).take(1 + rng.nextInt(2)).sorted
        val aggs = (0 until 1 + rng.nextInt(3)).map(genAgg(rng, t.nums, t.intNums, _))
        var df = spark.table(t.name)
        pred.foreach(p => df = df.filter(p.c))
        df = df.groupBy(keys.map(col): _*).agg(aggs.head._2, aggs.tail.map(_._2): _*)
        val sql = s"SELECT ${keys.mkString(", ")}, ${aggs.map(_._3).mkString(", ")} " +
          s"FROM ${t.name}${pred.map(p => s" WHERE ${p.sql}").getOrElse("")} " +
          s"GROUP BY ${keys.mkString(", ")}"
        (df, sql, false)

      case 2 => // join + filter + groupBy + aggregate
        val (li, ri, lk, rk) = joinPairs(rng.nextInt(joinPairs.size))
        val (lt, rt) = (tbls(li), tbls(ri))
        val pred = genPred(rng, lt)
        val keyPool = lt.strs ++ rt.nums
        val keys = rng.shuffle(keyPool).take(1 + rng.nextInt(2)).sorted
        val aggs = (0 until 1 + rng.nextInt(2)).map(genAgg(rng, lt.nums, lt.intNums, _))
        var df = spark.table(lt.name).join(spark.table(rt.name), col(lk) === col(rk))
        pred.foreach(p => df = df.filter(p.c))
        df = df.groupBy(keys.map(col): _*).agg(aggs.head._2, aggs.tail.map(_._2): _*)
        val sql = s"SELECT ${keys.mkString(", ")}, ${aggs.map(_._3).mkString(", ")} " +
          s"FROM ${lt.name} JOIN ${rt.name} ON $lk = $rk" +
          s"${pred.map(p => s" WHERE ${p.sql}").getOrElse("")} " +
          s"GROUP BY ${keys.mkString(", ")}"
        (df, sql, false)

      case 3 => // global aggregate (no GROUP BY; empty input → one null-ish row)
        val t = tbls(rng.nextInt(tbls.size))
        val pred = genPred(rng, t)
        val aggs = (0 until 1 + rng.nextInt(3)).map(genAgg(rng, t.nums, t.intNums, _))
        var df = spark.table(t.name)
        pred.foreach(p => df = df.filter(p.c))
        df = df.agg(aggs.head._2, aggs.tail.map(_._2): _*)
        val sql = s"SELECT ${aggs.map(_._3).mkString(", ")} " +
          s"FROM ${t.name}${pred.map(p => s" WHERE ${p.sql}").getOrElse("")}"
        (df, sql, false)

      case 4 => // sort + limit, ordered by every projected column (total
                // order up to duplicate rows) — compared IN ORDER
        val t = tbls(rng.nextInt(tbls.size))
        val pred = genPred(rng, t)
        val all = t.nums ++ t.strs
        val cols = rng.shuffle(all).take(1 + rng.nextInt(all.size)).sorted
        val n = 5 + rng.nextInt(40)
        var df = spark.table(t.name)
        pred.foreach(p => df = df.filter(p.c))
        df = df.select(cols.map(col): _*).orderBy(cols.map(col): _*).limit(n)
        val sql = s"SELECT ${cols.mkString(", ")} FROM ${t.name}" +
          s"${pred.map(p => s" WHERE ${p.sql}").getOrElse("")} " +
          s"ORDER BY ${cols.mkString(", ")} LIMIT $n"
        (df, sql, true)

      case 5 => // per-group window top-k (row_number with a unique tiebreak)
        val t = tbls(rng.nextInt(tbls.size))
        val part = (t.strs ++ t.nums.filterNot(_ == t.uniqueKey))(
          rng.nextInt(t.strs.size + t.nums.size - 1))
        val ord = t.nums(rng.nextInt(t.nums.size))
        val k = 1 + rng.nextInt(4)
        val w = Window.partitionBy(part)
          .orderBy(col(ord).desc, col(t.uniqueKey))
        val df = spark.table(t.name)
          .select(col(part), col(ord), col(t.uniqueKey))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
        val sql = s"SELECT $part, $ord, ${t.uniqueKey}, rn FROM (" +
          s"SELECT $part, $ord, ${t.uniqueKey}, " +
          s"ROW_NUMBER() OVER (PARTITION BY $part ORDER BY $ord DESC, ${t.uniqueKey}) AS rn " +
          s"FROM ${t.name}) WHERE rn <= $k"
        (df, sql, false)

      case 6 => // self UNION ALL under two predicates, then re-aggregate
        val t = tbls(rng.nextInt(tbls.size))
        val c = t.nums(rng.nextInt(t.nums.size))
        val (p1, p2) = (genPred(rng, t), genPred(rng, t))
        def side(p: Option[Pred]) = {
          var d = spark.table(t.name)
          p.foreach(x => d = d.filter(x.c))
          d.select(col(c).as("k"))
        }
        val df = side(p1).union(side(p2))
          .groupBy("k").agg(count(lit(1)).as("c"))
        def sideSql(p: Option[Pred]) =
          s"SELECT $c AS k FROM ${t.name}${p.map(x => s" WHERE ${x.sql}").getOrElse("")}"
        val sql = s"SELECT k, COUNT(*) AS c FROM " +
          s"(${sideSql(p1)} UNION ALL ${sideSql(p2)}) GROUP BY k"
        (df, sql, false)

      case 7 => // set ops between two filtered projections, incl. ALL forms
        val t = tbls(rng.nextInt(tbls.size))
        val all = t.nums ++ t.strs
        val cols = rng.shuffle(all).take(1 + rng.nextInt(2)).sorted
        val (p1, p2) = (genPred(rng, t), genPred(rng, t))
        def side(p: Option[Pred]) = {
          var d = spark.table(t.name)
          p.foreach(x => d = d.filter(x.c))
          d.select(cols.map(col): _*)
        }
        def sideSql(p: Option[Pred]) =
          s"SELECT ${cols.mkString(", ")} FROM ${t.name}" +
            p.map(x => s" WHERE ${x.sql}").getOrElse("")
        val (opSql, df) = rng.nextInt(4) match {
          case 0 => ("INTERSECT", side(p1).intersect(side(p2)))
          case 1 => ("EXCEPT", side(p1).except(side(p2)))
          case 2 => ("INTERSECT ALL", side(p1).intersectAll(side(p2)))
          case _ => ("EXCEPT ALL", side(p1).exceptAll(side(p2)))
        }
        (df, s"${sideSql(p1)} $opSql ${sideSql(p2)}", false)

      case 8 => // semi / anti join, written as IN / NOT IN subquery (the
                // spelling BOTH engines parse; TPC-H keys are non-null,
                // so IN-subquery ≡ left_semi and NOT IN ≡ left_anti)
        val (li, ri, lk, rk) = joinPairs(rng.nextInt(joinPairs.size))
        val (lt, rt) = (tbls(li), tbls(ri))
        val rp = genPred(rng, rt)
        val anti = rng.nextBoolean()
        val all = lt.nums ++ lt.strs
        val cols = rng.shuffle(all).take(1 + rng.nextInt(2)).sorted
        var right = spark.table(rt.name)
        rp.foreach(p => right = right.filter(p.c))
        val df = spark.table(lt.name)
          .join(right, col(lk) === col(rk), if (anti) "left_anti" else "left_semi")
          .select(cols.map(col): _*)
        val sub = s"SELECT $rk FROM ${rt.name}" +
          rp.map(p => s" WHERE ${p.sql}").getOrElse("")
        val sql = s"SELECT ${cols.mkString(", ")} FROM ${lt.name} " +
          s"WHERE $lk ${if (anti) "NOT IN" else "IN"} ($sub)"
        (df, sql, false)

      case 9 => // window-function family beyond row_number: rank /
                // dense_rank / lag / running sum (frame + unique tiebreak
                // keep every variant deterministic; running sum draws
                // from INT columns only — double accumulation order)
        val t = tbls(rng.nextInt(tbls.size))
        val part = (t.strs ++ t.nums.filterNot(_ == t.uniqueKey))(
          rng.nextInt(t.strs.size + t.nums.size - 1))
        val ord = t.nums(rng.nextInt(t.nums.size))
        val ic = t.intNums(rng.nextInt(t.intNums.size))
        val base = spark.table(t.name).select(col(part), col(ord), col(t.uniqueKey))
        val (wCol, wSql) = rng.nextInt(4) match {
          case 0 =>
            val w = Window.partitionBy(part).orderBy(col(ord).desc, col(t.uniqueKey))
            (rank().over(w),
              s"RANK() OVER (PARTITION BY $part ORDER BY $ord DESC, ${t.uniqueKey})")
          case 1 =>
            val w = Window.partitionBy(part).orderBy(col(ord).desc, col(t.uniqueKey))
            (dense_rank().over(w),
              s"DENSE_RANK() OVER (PARTITION BY $part ORDER BY $ord DESC, ${t.uniqueKey})")
          case 2 =>
            val w = Window.partitionBy(part).orderBy(col(ord), col(t.uniqueKey))
            (lag(col(ord), 1).over(w),
              s"LAG($ord, 1) OVER (PARTITION BY $part ORDER BY $ord, ${t.uniqueKey})")
          case _ =>
            val w = Window.partitionBy(part).orderBy(col(ic), col(t.uniqueKey))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            (sum(col(ic)).over(w),
              s"SUM($ic) OVER (PARTITION BY $part ORDER BY $ic, ${t.uniqueKey} " +
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
        }
        val df = base.withColumn("wv", wCol)
        val sql = s"SELECT $part, $ord, ${t.uniqueKey}, $wSql AS wv FROM ${t.name}"
        (df, sql, false)

      case 10 => // groupBy + HAVING on an aggregate
        val t = tbls(rng.nextInt(tbls.size))
        val all = t.strs ++ t.nums
        val keys = rng.shuffle(all).take(1 + rng.nextInt(2)).sorted
        val aggs = (0 until 1 + rng.nextInt(2)).map(genAgg(rng, t.nums, t.intNums, _))
        val n = 1 + rng.nextInt(10)
        val aggCols = count(lit(1)).as("hc") +: aggs.map(_._2)
        val df = spark.table(t.name)
          .groupBy(keys.map(col): _*)
          .agg(aggCols.head, aggCols.tail: _*)
          .filter(col("hc") > n)
        val sql = s"SELECT ${keys.mkString(", ")}, COUNT(*) AS hc, " +
          s"${aggs.map(_._3).mkString(", ")} FROM ${t.name} " +
          s"GROUP BY ${keys.mkString(", ")} HAVING COUNT(*) > $n"
        (df, sql, false)

      case 11 => // CASE WHEN bucketing expression, then re-aggregate
        val t = tbls(rng.nextInt(tbls.size))
        val c = t.intNums(rng.nextInt(t.intNums.size))
        val m = 2 + rng.nextInt(4)
        val pred = genPred(rng, t)
        var df = spark.table(t.name)
        pred.foreach(p => df = df.filter(p.c))
        df = df
          .select(when(col(c) % m === 0, "zero")
            .when(col(c) % m === 1, "one")
            .otherwise("rest").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("c"))
        val sql = "SELECT CASE WHEN " +
          s"$c % $m = 0 THEN 'zero' WHEN $c % $m = 1 THEN 'one' ELSE 'rest' END " +
          s"AS bucket, COUNT(*) AS c FROM ${t.name}" +
          s"${pred.map(p => s" WHERE ${p.sql}").getOrElse("")} " +
          "GROUP BY 1"
        (df, sql, false)

      case 12 => // correlated EXISTS / NOT EXISTS with an extra right-side
                 // predicate (decorrelates to semi/anti; the EXISTS spelling
                 // both engines parse, complementing shape 8's IN form)
        val (li, ri, lk, rk) = joinPairs(rng.nextInt(joinPairs.size))
        val (lt, rt) = (tbls(li), tbls(ri))
        val rp = genPred(rng, rt)
        val anti = rng.nextBoolean()
        val all = lt.nums ++ lt.strs
        val cols = rng.shuffle(all).take(1 + rng.nextInt(2)).sorted
        var right = spark.table(rt.name)
        rp.foreach(p => right = right.filter(p.c))
        val df = spark.table(lt.name)
          .join(right.select(col(rk)), col(lk) === col(rk),
            if (anti) "left_anti" else "left_semi")
          .select(cols.map(col): _*)
        val sql = s"SELECT ${cols.mkString(", ")} FROM ${lt.name} " +
          s"WHERE ${if (anti) "NOT EXISTS" else "EXISTS"} " +
          s"(SELECT 1 FROM ${rt.name} WHERE $rk = $lk" +
          rp.map(p => s" AND ${p.sql}").getOrElse("") + ")"
        (df, sql, false)

      case 13 => // scalar subquery threshold: MIN/MAX are exact (no float
                 // accumulation), so the comparison cannot drift across
                 // engines; DataFrame side is the 1-row broadcast join
        val t = tbls(rng.nextInt(tbls.size))
        val t2 = tbls(rng.nextInt(tbls.size))
        val c = t.intNums(rng.nextInt(t.intNums.size))
        val c2 = t2.intNums(rng.nextInt(t2.intNums.size))
        val useMin = rng.nextBoolean()
        val all = t.nums ++ t.strs
        val cols = rng.shuffle(all).take(1 + rng.nextInt(2)).sorted
        val scalar = spark.table(t2.name)
          .agg((if (useMin) min(col(c2)) else max(col(c2))).as("sv"))
        val df = spark.table(t.name)
          .join(broadcast(scalar))
          .filter(col(c) <= col("sv"))
          .select(cols.map(col): _*)
        val sql = s"SELECT ${cols.mkString(", ")} FROM ${t.name} " +
          s"WHERE $c <= (SELECT ${if (useMin) "MIN" else "MAX"}($c2) FROM ${t2.name})"
        (df, sql, false)

      case 14 => // unpivot (wide aggregate melted to long): DataFrame
                // unpivot vs the UNION ALL spelling every engine parses;
                // both metrics are LongType so no unification cast
        val t = tbls(rng.nextInt(tbls.size))
        val all = t.strs ++ t.nums
        val key = all(rng.nextInt(all.size))
        val ic = t.intNums(rng.nextInt(t.intNums.size))
        val wide = spark.table(t.name)
          .groupBy(col(key))
          .agg(count(lit(1)).as("m1"), max(col(ic)).as("m2"))
        val df = wide.unpivot(Array(col(key)), Array(col("m1"), col("m2")),
          "metric", "value")
        val sql = s"WITH w AS (SELECT $key, COUNT(*) AS m1, MAX($ic) AS m2 " +
          s"FROM ${t.name} GROUP BY $key) " +
          s"SELECT $key, 'm1' AS metric, m1 AS value FROM w " +
          s"UNION ALL SELECT $key, 'm2', m2 FROM w"
        (df, sql, false)

      case 15 => // snapshot-diff shape (round 9): FULL OUTER JOIN on the
                 // join key, reduced to exact integer fate counts with a
                 // null-safe match (IS NOT DISTINCT FROM ↔ <=>)
        val (li, ri, lk, rk) = joinPairs(rng.nextInt(joinPairs.size))
        val (lt, rt) = (tbls(li), tbls(ri))
        val df = spark.table(lt.name).select(col(lk))
          .join(spark.table(rt.name).select(col(rk)),
            col(lk) === col(rk), "full_outer")
          .agg(count(lit(1)).as("n"),
            sum(when(col(lk).isNull, 1L).otherwise(0L)).as("only_r"),
            sum(when(col(rk).isNull, 1L).otherwise(0L)).as("only_l"),
            sum(when(col(lk) <=> col(rk), 1L).otherwise(0L)).as("matched"))
        val sql = "SELECT COUNT(*) AS n, " +
          s"SUM(CASE WHEN $lk IS NULL THEN 1 ELSE 0 END) AS only_r, " +
          s"SUM(CASE WHEN $rk IS NULL THEN 1 ELSE 0 END) AS only_l, " +
          s"SUM(CASE WHEN $lk IS NOT DISTINCT FROM $rk THEN 1 ELSE 0 END) AS matched " +
          s"FROM (SELECT $lk FROM ${lt.name}) AS a " +
          s"FULL OUTER JOIN (SELECT $rk FROM ${rt.name}) AS b ON $lk = $rk"
        (df, sql, false)

      case _ => // ROLLUP hierarchy totals (round 9): subtotal rows join
                // the regular groups; INT sums only, so every value is
                // exact and the unordered canon compares cleanly
        val t = tbls(rng.nextInt(tbls.size))
        val keys = rng.shuffle((t.strs ++ t.intNums).distinct).take(2).sorted
        val ic = t.intNums(rng.nextInt(t.intNums.size))
        val df = spark.table(t.name)
          .rollup(keys.map(col): _*)
          .agg(count(lit(1)).as("c"), sum(col(ic)).as("s"))
        val sql = s"SELECT ${keys.mkString(", ")}, COUNT(*) AS c, SUM($ic) AS s " +
          s"FROM ${t.name} GROUP BY ROLLUP (${keys.mkString(", ")})"
        (df, sql, false)
    }
  }

  test("330 random plans: DataFrame program == spark.sql of the generated ANSI SQL") {
    Tables.registerAll(spark, sfTiny)
    val dump = scala.collection.mutable.ListBuffer[String]()
    val failures = (0 until 330).flatMap { i =>
      val seed = 0xF0002 + i
      val (df, sql, ordered) = genCase(seed)
      def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] = {
        val s = rows.map(_.toString).toSeq
        if (ordered) s else s.sorted
      }
      val viaApi = canon(df.collect())
      val viaSql = canon(spark.sql(sql).collect())
      dump += s"$seed\t${viaApi.size}\t$sql"
      if (viaApi == viaSql) None
      else Some(s"seed=$seed sql=[$sql] first-diff=" +
        viaApi.zipAll(viaSql, "<none>", "<none>").find(p => p._1 != p._2))
    }
    // side artifact for the cross-engine leg: tools/check_fuzz_sql.py
    // replays every generated SQL in DuckDB (parse + execute + row-count
    // compare), proving the "ANSI subset DuckDB parses too" claim
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/fuzz_sql.tsv"),
      dump.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
