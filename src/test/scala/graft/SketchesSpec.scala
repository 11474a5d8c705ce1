package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import graft.operators.{Sketches, TextAnalysis}
import graft.sources.Tables

/** Sketch-persistence correctness (qk_hll_rollup has no SQL oracle —
  * DuckDB can't reproduce DataSketches HLL binaries — so the correctness
  * argument lives here) + the deterministic-sampling operator. */
class SketchesSpec extends SparkSpec {

  private def mergedByYear: Map[String, Long] =
    Sketches.hllRollupRaw(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("qk self-certification rows: every bound boolean is true at test SF") {
    Sketches.qkHllRollup(spark, sfTiny).collect().foreach { r =>
      assert(r.getAs[Boolean]("hll_within_5pct"), s"hll bound failed: $r")
    }
    Sketches.qkThetaOverlap(spark, sfTiny).collect().foreach { r =>
      assert(r.getAs[Boolean]("theta_sizes_ok") && r.getAs[Boolean]("theta_shared_ok"),
        s"theta bound failed: $r")
    }
    Sketches.qkBloomUnseen(spark, sfTiny).collect().foreach { r =>
      assert(r.getAs[Boolean]("bloom_within_band"), s"bloom band failed: $r")
    }
    Sketches.qkKllQuantiles(spark, sfTiny).collect().foreach { r =>
      assert(r.getAs[Boolean]("p50_rank_ok") && r.getAs[Boolean]("p95_rank_ok") &&
        r.getAs[Boolean]("p99_rank_ok"), s"kll rank bound failed: $r")
    }
  }

  test("merging per-month partials equals sketching the whole input directly") {
    // HLL registers are a set-function of the hashed input (per-register
    // max), so the merged estimate must be IDENTICAL, not merely close
    val direct = Tables.orders(spark, sfTiny)
      .select(date_format(col("o_orderdate"), "yyyy").as("year"), col("o_custkey"))
      .groupBy("year")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(12))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = mergedByYear
    assert(merged.nonEmpty)
    assert(merged == direct)
  }

  test("estimates land within the HLL error envelope of the exact distinct count") {
    val exact = Tables.orders(spark, sfTiny)
      .select(date_format(col("o_orderdate"), "yyyy").as("year"), col("o_custkey"))
      .groupBy("year")
      .agg(countDistinct(col("o_custkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = mergedByYear
    assert(merged.keySet == exact.keySet)
    merged.foreach { case (year, est) =>
      val e = exact(year).toDouble
      // lgConfigK=12 ⇒ ~1.6% standard error; 5% is > 3 sigma
      assert(math.abs(est - e) / e < 0.05, s"$year: est $est vs exact $e")
    }
  }

  test("sketch partials survive a parquet round trip and still merge") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sketches").toString
    val partials = Sketches.customerSketchByMonth(spark, sfTiny)
    assert(partials.schema("sketch").dataType == BinaryType, "sketches must be storable binary")
    partials.write.mode("overwrite").parquet(dir)
    val reread = Sketches.rollupToYears(spark.read.parquet(dir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reread == mergedByYear)
    // the stored summary is kilobytes per partition, not data-sized
    val maxLen = partials.select(max(length(col("sketch")))).head.getInt(0)
    assert(maxLen <= 4096 + 64, s"sketch blob unexpectedly large: $maxLen bytes")
  }

  // ---- theta sketches: the intersectable summary (qk_theta_overlap) ----

  test("theta sketches are exact below capacity: known sets, exact intersection") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // corpus a = t0..t999, corpus b = t500..t1499 → 500 shared tokens;
    // both well under the 2^14 nominal entries ⇒ θ = 1, sketch is EXACT
    val df = ((0 until 1000).map(i => ("a", s"t$i")) ++
      (500 until 1500).map(i => ("b", s"t$i"))).toDF("corpus", "token")
      .repartition(7) // sketches must not care how rows are partitioned
    val sk = df.groupBy("corpus").agg(expr("theta_sketch_agg(token, 14)").as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(graft.functions.ThetaUtil.estimate(sk("a")) == 1000.0)
    assert(graft.functions.ThetaUtil.estimate(sk("b")) == 1000.0)
    assert(graft.functions.ThetaUtil.intersectEstimate(sk("a"), sk("b")) == 500.0)
    // duplicates are idempotent: resketching the doubled input changes nothing
    val doubled = df.union(df).groupBy("corpus").agg(expr("theta_sketch_agg(token, 14)").as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(graft.functions.ThetaUtil.estimate(doubled("a")) == 1000.0)
  }

  test("qk_theta_overlap bounds against exact split-token overlap on the real corpus") {
    val overlap = Sketches.thetaOverlapRaw(spark, sfTiny)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(overlap.keySet == Set(("test", "train"), ("test", "val"), ("train", "val")))
    // exact truth via plain distinct joins (same split definition)
    val distinctTokens = graft.sources.Tables.documents(spark, sfTiny)
      .withColumn("bucket", substring(md5(col("text")), 1, 2))
      .withColumn("split",
        when(col("bucket") < "cc", lit("train"))
          .when(col("bucket") < "e6", lit("val"))
          .otherwise(lit("test")))
      .select(col("split"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "").distinct().cache()
    val exactSizes = distinctTokens.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t2 = distinctTokens.withColumnRenamed("split", "split_b")
    val exactShared = distinctTokens.join(t2, Seq("token"))
      .filter(col("split") < col("split_b"))
      .groupBy("split", "split_b").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    distinctTokens.unpersist()
    def close(est: Long, exact: Long, tol: Double): Boolean =
      math.abs(est - exact) <= math.max(2.0, tol * exact)
    overlap.foreach { case ((a, b), (estA, estB, estShared)) =>
      assert(close(estA, exactSizes(a), 0.05), s"$a size: $estA vs ${exactSizes(a)}")
      assert(close(estB, exactSizes(b), 0.05), s"$b size: $estB vs ${exactSizes(b)}")
      assert(close(estShared, exactShared((a, b)), 0.10),
        s"($a,$b) shared: $estShared vs ${exactShared((a, b))}")
    }
  }

  test("theta functions are reachable from plain SQL") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val est = spark.sql(
      "SELECT theta_estimate(theta_sketch_agg(c, 12)) FROM VALUES ('x'), ('y'), ('x') AS t(c)")
      .head.getDouble(0)
    assert(est == 2.0)
  }

  // ---- KLL quantile sketches (qk_kll_quantiles) ----

  test("KLL: exact below capacity; merged rollup within the rank-error envelope") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // 150 values < k=200 ⇒ no compaction, quantiles are EXACT order stats
    val small = (1 to 150).map(_.toDouble).toDF("v")
    val sk = small.agg(expr("kll_quantile_agg(v)").as("s"))
      .head.getAs[Array[Byte]](0)
    assert(graft.functions.KllUtil.quantile(sk, 0.5) == 75.0)
    assert(graft.functions.KllUtil.quantile(sk, 1.0) == 150.0)
    // real column: per-year merged estimate must sit within the KLL rank
    // envelope — check the RANK of each estimate against the exact data
    val rows = Sketches.kllQuantilesRaw(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    val prices = graft.sources.Tables.orders(spark, sfTiny)
      .select(substring(col("o_orderdate").cast("string"), 1, 4).as("year"),
        col("o_totalprice"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    rows.foreach { r =>
      val year = r.getString(0)
      val sorted = prices(year)
      for ((est, target) <- Seq((r.getDouble(1), 0.5), (r.getDouble(2), 0.95),
        (r.getDouble(3), 0.99))) {
        val rank = sorted.count(_ <= est).toDouble / sorted.length
        // k=200 ⇒ ±1.65% rank at 99% confidence; 3% is comfortable
        assert(math.abs(rank - target) < 0.03,
          s"$year p$target: est $est sits at rank $rank")
      }
    }
  }

  test("KLL: an all-null group yields NaN, not a crash") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("b", None))
      .toDF("g", "v")
    val out = df.groupBy("g")
      .agg(expr("kll_quantile(kll_quantile_agg(v), 0.5d)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") == 1.0 || out("a") == 2.0) // exact order stat, n=2
    assert(out("b").isNaN, "empty sketch must answer NaN")
  }

  test("KLL partials survive parquet byte-exact; stored blobs answer quantiles") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-kll").toString
    // cache first: KLL level-0 layout depends on arrival order, so the
    // blobs are compared against the SAME materialization that was
    // written, not a recompute (merge compaction is also randomized —
    // semantic bounds, not byte equality, are the cross-run contract)
    val partials = Sketches.priceSketchByMonth(spark, sfTiny).cache()
    try {
      partials.write.mode("overwrite").parquet(dir)
      val orig = partials.collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk").toSeq).toMap
      val back = spark.read.parquet(dir).collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk").toSeq).toMap
      assert(back == orig, "stored sketch blobs must round-trip byte-exact")
      // a stored blob is immediately queryable at any rank
      val anyMonth = orig.head._2.toArray
      val p0 = graft.functions.KllUtil.quantile(anyMonth, 0.0)
      val p100 = graft.functions.KllUtil.quantile(anyMonth, 1.0)
      assert(p0 <= p100)
    } finally partials.unpersist()
  }

  // ---- stored bloom membership (qk_bloom_unseen) ----

  test("seen-filter: no false negatives, bounded false positives, zero-join probe") {
    import spark.implicits._
    val seenKeys = (0L until 20000L).toDF("k")
    val filter = Sketches.buildSeenFilter(seenKeys, "k",
      expectedItems = 20000L, numBits = 400000L) // 20 bits/key
    // the membership contract: a seen key can NEVER pass as unseen
    assert(Sketches.filterUnseen(seenKeys, "k", filter).count() == 0)
    // disjoint keys: false positives bounded by the sizing
    val novel = (1000000L until 1020000L).toDF("k")
    val passed = Sketches.filterUnseen(novel, "k", filter).count()
    val fpRate = 1.0 - passed.toDouble / 20000
    assert(fpRate < 0.05, s"false-positive rate $fpRate")
    // and the probe is join-free: the filter ships inside the predicate
    val plan = Sketches.filterUnseen(novel, "k", filter)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"membership probe must not plan a join:\n$plan")
  }

  test("sharded seen-filter: same contract as one blob, one scan, join-free") {
    import spark.implicits._
    val seenKeys = (0L until 30000L).toDF("k")
    val filters = Sketches.buildSeenFilterSharded(seenKeys, "k", shards = 8,
      expectedItemsPerShard = 4000L, numBitsPerShard = 80000L)
    assert(filters.length == 8, "every shard saw keys")
    // no false negatives across shard routing
    assert(Sketches.filterUnseenSharded(seenKeys, "k", 8, filters).count() == 0)
    // disjoint keys: bounded fp, and a plan with neither join nor union
    val novel = (5000000L until 5020000L).toDF("k")
    val out = Sketches.filterUnseenSharded(novel, "k", 8, filters)
    val passed = out.count()
    assert(1.0 - passed.toDouble / 20000 < 0.05, s"fp rate ${1.0 - passed.toDouble / 20000}")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Union"),
      s"sharded probe must stay one join-free scan:\n$plan")
  }

  test("qk_bloom_unseen: conservative subset of the exact anti-join truth") {
    val bloom = Sketches.bloomUnseenRaw(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bloom.nonEmpty)
    val orders = graft.sources.Tables.orders(spark, sfTiny)
      .select(col("o_custkey"), substring(col("o_orderdate").cast("string"), 1, 4).as("year"))
    val seen = orders.filter(col("year") < "1998").select("o_custkey").distinct()
    val exact = orders.filter(col("year") >= "1998")
      .join(seen, Seq("o_custkey"), "left_anti")
      .groupBy("year").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bloom.keySet == exact.keySet)
    exact.foreach { case (year, ex) =>
      val bl = bloom(year)
      // no false negatives ⇒ never OVER-counts; fp sizing ⇒ misses few
      assert(bl <= ex, s"$year: bloom $bl must not exceed exact $ex")
      assert(bl >= (ex * 0.9).toLong, s"$year: bloom $bl lost too much of exact $ex")
    }
  }

  // ---- deterministic per-stratum sampling (qp_sample) ----

  test("qp_sample keeps exactly min(k, stratum size) docs per stratum") {
    val k = 7
    val sample = TextAnalysis.qpSample(spark, sfTiny, k = k)
    val got = sample.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val strata = Tables.documents(spark, sfTiny).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == strata.keySet)
    got.foreach { case (lang, n) => assert(n == math.min(k.toLong, strata(lang)), lang) }
    // rn is a contiguous 1..n rank within each stratum
    val ranks = sample.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sorted.toSeq).toMap
    ranks.foreach { case (lang, rs) => assert(rs == (1L to rs.length), lang) }
  }

  test("qp_sample is reproducible across runs and repartitionings; seed redraws it") {
    val a = TextAnalysis.qpSample(spark, sfTiny, k = 10).collect().map(_.toSeq).toSeq
    val b = TextAnalysis.qpSample(spark, sfTiny, k = 10).collect().map(_.toSeq).toSeq
    assert(a == b, "same seed must draw the identical sample")
    val redrawn = TextAnalysis.qpSample(spark, sfTiny, k = 10, seed = "other")
      .collect().map(_.toSeq).toSeq
    assert(redrawn != a, "a different seed must redraw the sample")
    // growing the budget only EXTENDS the sample (bottom-k nesting)
    val k5 = TextAnalysis.qpSample(spark, sfTiny, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val k10 = a.map(s => (s(0).asInstanceOf[String], s(1).asInstanceOf[Long])).toSet
    assert(k5.subsetOf(k10), "k=5 sample must be a prefix of the k=10 sample")
  }

  test("seen-filter over ZERO rows has seen nothing: the probe keeps every row") {
    import spark.implicits._
    // BloomFilterAggregate evaluates to null over an empty input; the
    // probe must read that as "no key was ever seen", not drop the batch
    val empty = spark.emptyDataset[Long].toDF("k")
    val filter = Sketches.buildSeenFilter(empty, "k",
      expectedItems = 100L, numBits = 10000L)
    val probe = (0L until 500L).toDF("k")
    assert(Sketches.filterUnseen(probe, "k", filter).count() == 500,
      "an empty seen-set classified new rows as already seen")
  }

  test("kll_quantile: an out-of-range rank answers NaN, not a crash") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val sk = (1 to 10).map(_.toDouble).toDF("v")
      .agg(expr("kll_quantile_agg(v)")).head.getAs[Array[Byte]](0)
    assert(graft.functions.KllUtil.quantile(sk, 1.5).isNaN)
    assert(graft.functions.KllUtil.quantile(sk, -0.1).isNaN)
    assert(graft.functions.KllUtil.quantile(sk, Double.NaN).isNaN)
    assert(graft.functions.KllUtil.quantile(sk, 0.5) == 5.0) // in-range unchanged
    // and through the codegen'd SQL path
    val viaSql = (1 to 10).map(_.toDouble).toDF("v")
      .agg(expr("kll_quantile(kll_quantile_agg(v), 1.5d)")).head.getDouble(0)
    assert(viaSql.isNaN)
  }

  test("kll_merge_agg adopts the stored sketches' k — no silent precision clamp") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // partials built at k=800; the default-k merge buffer must re-home
    // onto 800 instead of clamping the rollup to k=200
    val partials = (1 to 4000).map(i => (i % 4, i.toDouble)).toDF("g", "v")
      .groupBy("g").agg(expr("kll_quantile_agg(v, 800)").as("sk"))
    val merged = partials.agg(expr("kll_merge_agg(sk)").as("m"))
      .head.getAs[Array[Byte]](0)
    val sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(merged))
    assert(sk.getK == 800, s"merge clamped k=800 partials down to k=${sk.getK}")
    assert(sk.getN == 4000)
  }
}
