package graft

import org.apache.spark.sql.functions.col
import graft.operators.Constraints
import graft.operators.Constraints._

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  test("checkRows: every rule kind counts exactly its planted violations, in ONE scan") {
    val df = Seq(
      (1L, Some("x"), 5.0, "O"),
      (2L, None: Option[String], -1.0, "F"),
      (3L, Some("y"), -2.0, "Z"),
      (4L, Some("z"), 0.0, "Q"))
      .toDF("k", "s", "v", "st")
    val report = Constraints.checkRows(df, Seq(
      notNull("s"), nonNegative("v"), inSet("st", Seq("O", "F")),
      inRange("v", 0.0, 4.0)))
    val got = report.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "not_null(s)" -> 1L,
      "non_negative(v)" -> 2L,
      "in_set(st)" -> 2L,
      "in_range(v)" -> 3L), got.toString)
    // one scan: a single aggregate over the input, no self-union of scans
    val plan = report.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"row rules must share one scan:\n$plan")
  }

  test("checkUnique and checkForeignKey: exact counts, clean inputs report zero") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "s")
    val uniq = Constraints.checkUnique(df, Seq("k")).collect().head
    assert(uniq.getLong(1) == 2L) // three rows of k=1 -> 2 beyond the first
    val dim = Seq(1L, 2L).toDF("id")
    val fk = Constraints.checkForeignKey(
      Seq(1L, 2L, 9L, 9L).toDF("k"), "k", dim, "id").collect().head
    assert(fk.getLong(1) == 2L)
    val clean = Constraints.checkUnique(Seq((1L, "a")).toDF("k", "s"), Seq("k"))
      .collect().head
    assert(clean.getLong(1) == 0L)
  }

  test("qa_constraints: FK probe broadcasts the dimension; fact side never shuffles for it") {
    val plan = Constraints.qaConstraints(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"FK check should be a broadcast anti-join:\n$plan")
  }

  test("skewReport profiles group sizes exactly, including the salting trigger ratio") {
    // key sizes: a->6, b->2, c->1, d->1 => mean 2.5, max 6
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .zipWithIndex.toDF("k", "i")
    val r = Constraints.skewReport(df, Seq("k")).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 10L && r.getLong(2) == 6L)
    assert(r.getDouble(3) == 2.5)           // mean_n
    assert(r.getDouble(4) == 1.5)           // p50 of (1,1,2,6)
    assert(r.getDouble(7) == 2.4)           // skew_ratio 6/2.5
    assert(r.getDouble(8) == 0.6)           // top_share 6/10
  }

  test("driftReport: identical snapshots are stable, a shifted snapshot crosses the gate") {
    import org.apache.spark.sql.functions.col
    // ref: values clustered low; cur identical -> PSI ~ 0 (only
    // smoothing noise); shifted cur -> PSI far above the 0.25 gate
    val same = (1 to 200).flatMap(i => Seq((0L, i % 100 * 1.0), (1L, i % 100 * 1.0)))
      .toDF("grp", "value")
    val psiSame = Constraints.driftReport(same, "value", col("grp") === 1, 50.0, 9)
      .collect().head.getDouble(4)
    assert(math.abs(psiSame) < 0.01, s"identical snapshots drifted: $psiSame")
    val shifted = ((1 to 200).map(i => (0L, i % 100 * 1.0)) ++
      (1 to 200).map(i => (1L, 300.0 + i % 100)))
      .toDF("grp", "value")
    val psiShift = Constraints.driftReport(shifted, "value", col("grp") === 1, 50.0, 9)
      .collect().head.getDouble(4)
    assert(psiShift > 0.25, s"planted shift must cross the action gate: $psiShift")
    // per-bin contributions sum to the total (integer-scaled, order-free)
    val rows = Constraints.driftReport(shifted, "value", col("grp") === 1, 50.0, 9).collect()
    val sum = rows.map(_.getDouble(3)).sum
    assert(math.abs(sum - rows.head.getDouble(4)) < 1e-5, s"$sum vs ${rows.head.getDouble(4)}")
  }

  test("bootstrapCiMean: deterministic, CI brackets the mean, replicate mass ~ n") {
    // 400 rows, values 1..400: point mean 200.5. Poisson(1) weights at
    // n=400 give each replicate mean a std error of ~200/20 ≈ 10, so a
    // 95% CI a few units wide around 200.5 — and everything md5-driven,
    // so two runs must agree byte-for-byte.
    val df = (1L to 400L).map(i => (i, i)).toSeq.toDF("doc_id", "v")
    val a = Constraints.bootstrapCiMean(df, "v", "doc_id").collect().head
    val b = Constraints.bootstrapCiMean(df, "v", "doc_id").collect().head
    assert(a == b, s"bootstrap must be deterministic: $a vs $b")
    val (nReps, point, lo, hi) =
      (a.getLong(0), a.getDouble(1), a.getDouble(2), a.getDouble(3))
    assert(nReps == 50L)
    assert(point == 200.5, s"point mean: $point")
    assert(lo <= point && point <= hi, s"CI [$lo, $hi] must bracket $point")
    assert(hi - lo > 1.0 && hi - lo < 80.0, s"CI width sanity: [$lo, $hi]")
    // a different seed moves the replicate draws but not the point mean
    val c = Constraints.bootstrapCiMean(df, "v", "doc_id", seed = "boot2")
      .collect().head
    assert(c.getDouble(1) == 200.5 && (c.getDouble(2) != lo || c.getDouble(3) != hi),
      s"seed must redraw the CI: $c vs [$lo, $hi]")
  }

  test("poissonCutoffs: the hex cutoff constants match the closed-form Poisson(1) CDF") {
    // independently derived (verified against Python's math.exp/floor):
    // floor(CDF(k) * 2^32) for k = 0..4 — the cutoffs both the Spark
    // plan and the oracle SQL embed. A drift here silently re-weights
    // every bootstrap replicate, so the constants are pinned.
    val cutoffs = {
      val f = Constraints.getClass.getDeclaredField("poissonCutoffs")
      f.setAccessible(true)
      f.get(Constraints).asInstanceOf[Seq[String]]
    }
    assert(cutoffs == Seq("5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797", "ff1025f5"),
      cutoffs.toString)
  }

  test("bootstrapCiMeanBy: per-group CIs bracket per-group means independently") {
    // two strata with far-apart means: each group's CI must bracket its
    // own mean and the groups must not bleed into each other
    val df = ((1L to 300L).map(i => ("lo", i, (i % 50) + 100.0)) ++
      (1L to 300L).map(i => ("hi", i + 1000, (i % 50) + 5000.0)))
      .toDF("grp", "doc_id", "v")
    val got = Constraints.bootstrapCiMeanBy(df, "grp", "v", "doc_id").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == Set("lo", "hi"))
    got.foreach { case (g, (n, point, lo, hi)) =>
      assert(n == 50L)
      assert(lo <= point && point <= hi, s"$g: CI [$lo, $hi] vs $point")
    }
    assert(got("lo")._4 < got("hi")._3,
      s"strata must not overlap: ${got("lo")} vs ${got("hi")}")
    // per-group point means are the exact group means
    assert(got("lo")._2 == 124.5 && got("hi")._2 == 5024.5, got.toString)
  }

  test("qaBootstrapCi on the real corpus: stable bracketing CI at 50 replicates") {
    val r = Constraints.qaBootstrapCi(spark, sfTiny).collect().head
    assert(r.getLong(0) == 50L)
    assert(r.getDouble(2) <= r.getDouble(1) && r.getDouble(1) <= r.getDouble(3),
      s"CI must bracket the point mean: $r")
  }
}
