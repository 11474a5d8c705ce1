package graft

import graft.operators.TextAnalysis

/** Semantics of the LM-based quality signal (qt_bigram_surprise); its
  * numeric parity is the driver's oracle row. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("bigram surprise: repeated transitions score lower than novel ones") {
    val docs = Seq(
      // one bigram repeated 8x: high corpus probability -> low surprisal
      (1L, ("the cat " * 9).trim),
      // every bigram unique in the corpus -> maximal smoothed surprisal
      (2L, "zebra quark nimbus oboe dune fjord glyph vex"),
      (3L, "x")) // single token: no bigram, excluded entirely
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprise(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_surprise")))).toMap
    assert(out.keySet == Set(1L, 2L), "a bigram-less doc must not appear")
    val (n1, s1) = out(1L)
    val (n2, s2) = out(2L)
    assert(n1 == 17L && n2 == 7L) // 18 and 8 tokens
    assert(s1 > 0 && s2 > 0, "smoothed surprisal is strictly positive")
    assert(s1 < s2,
      s"repetitive doc must score lower surprisal: $s1 vs $s2")
  }

  test("bigram surprise: a known two-doc corpus computes the closed form exactly") {
    // corpus: "a b" and "a b". bigram 'a b' occurs twice; context 'a'
    // twice; vocab = {a, b} = 2. P = (2+1)/(2+2) = 0.75 for both docs.
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val want = BigDecimal(-math.log(0.75))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    TextAnalysis.bigramSurprise(docs).collect().foreach { r =>
      assert(r.getAs[Long]("n_bigrams") == 1L)
      assert(r.getAs[Double]("avg_surprise") == want)
    }
  }

  test("pmiCollocations: an always-adjacent pair outranks frequent-but-independent pairs") {
    // "aa bb" co-occur ONLY together; "xx" is frequent everywhere, so
    // any "xx ..." bigram is near-chance and must rank below the
    // collocation. Distinct filler words keep other bigrams under
    // min-support.
    val docs = (1 to 6).map { i =>
      (i.toLong, s"aa bb xx f$i xx g$i xx h$i xx aa bb xx")
    }.toDF("doc_id", "text")
    val top = TextAnalysis.pmiCollocations(docs, minCount = 2, k = 3)
      .collect().map(_.getString(0))
    assert(top.head == "aa bb", s"expected the planted collocation first: ${top.toSeq}")
  }

  test("weightedSample: exact k per stratum, deterministic, seed redraws") {
    val df = (1L to 40L).map(i => ("s" + (i % 2), i, if (i <= 8) 10L else 1L))
      .toDF("stratum", "id", "w")
    def draw(seed: Long) = TextAnalysis
      .weightedSample(df, "stratum", "w", "id", k = 5, seed = seed)
      .select("stratum", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val a = draw(1L)
    assert(a.groupBy(_._1).values.forall(_.size == 5), s"not exactly k per stratum: $a")
    assert(draw(1L) == a, "same seed must redraw the same sample")
    assert((1L to 6L).map(draw).toSet.size > 1, "changing the seed never redrew")
  }

  test("weightedSample: heavy rows are drawn proportionally more often (ES bias)") {
    // weight 10 vs weight 1 in one stratum; over 24 seeds, the 8 heavy
    // ids (weight share 80/112) must dominate the k=5 draws — and every
    // light id must still be drawable in principle (no hard exclusion)
    val df = (1L to 40L).map(i => ("s", i, if (i <= 8) 10L else 1L))
      .toDF("stratum", "id", "w")
    val draws = (1L to 24L).map { seed =>
      TextAnalysis.weightedSample(df, "stratum", "w", "id", k = 5, seed = seed * 7919L)
        .select("id").collect().map(_.getLong(0)).toSet
    }
    val heavyPerDraw = draws.map(_.count(_ <= 8L))
    val mean = heavyPerDraw.sum.toDouble / draws.size
    // with-replacement expectation ≈ 5·80/112 ≈ 3.6; without-replacement
    // is a bit lower — anything ≥ 2.5 proves the weighting bites, while
    // an unweighted draw would sit at 5·8/40 = 1.0
    assert(mean >= 2.5, s"weighting too weak: mean heavy per draw = $mean")
    assert(mean <= 4.9, s"light rows never drawn: mean heavy per draw = $mean")
  }

  test("weightedSample: non-positive weights are excluded") {
    val df = Seq(("s", 1L, 5L), ("s", 2L, 0L), ("s", 3L, -1L), ("s", 4L, 2L))
      .toDF("stratum", "id", "w")
    val got = TextAnalysis.weightedSample(df, "stratum", "w", "id", k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
  }

  test("tokenEntropy: hand-computed H, uniform maxes norm at 1, constant doc floors at 0") {
    // "a a b b": H = ln4 - (2·ln2 + 2·ln2)/4 = ln2 -> 0.6931, norm = H/ln2 = 1.0
    // "a a a a": H = ln4 - 4·ln4/4 = 0, n_uniq=1 -> norm 0.0 by the guard
    // "a b c d": H = ln4 - 0 = 1.3863, norm = 1.0
    // "a a a b": H = ln4 - 3·ln3/4 = 0.5623, norm = 0.5623/ln2 = 0.8113
    val docs = Seq((1L, "a a b b"), (2L, "a a a a"), (3L, "a b c d"), (4L, "a a a b"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(rows(1) == (4L, 2L, 0.6931, 1.0), rows(1).toString)
    assert(rows(2) == (4L, 1L, 0.0, 0.0), rows(2).toString)
    assert(rows(3) == (4L, 4L, 1.3863, 1.0), rows(3).toString)
    assert(rows(4) == (4L, 2L, 0.5623, 0.8113), rows(4).toString)
  }

  test("sourceCapFunnel: cap binds per source, best-scored docs survive, funnel reconciles") {
    // srcA: 3 docs with distinct ppm-uniqueness scores; k=2 must keep
    // the two most-unique and floor at the runner-up's score.
    //   a1 "x x x x"   -> uniq 1/4 -> 250000
    //   a2 "x y x y"   -> uniq 2/4 -> 500000
    //   a3 "w x y z"   -> uniq 4/4 -> 1000000
    // srcB: 1 doc (cap not binding).
    val docs = Seq(
      ("srcA", 1L, "x x x x"), ("srcA", 2L, "x y x y"), ("srcA", 3L, "w x y z"),
      ("srcB", 4L, "lone doc"))
      .toDF("source", "doc_id", "text")
    val rows = TextAnalysis.sourceCapFunnel(docs, k = 2).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(rows("srcA") == Seq(3L, 2L, 21L, 14L, 500000L), rows("srcA").toString)
    assert(rows("srcB") == Seq(1L, 1L, 8L, 8L, 1000000L), rows("srcB").toString)
    // ties on score fall back to doc_id: two identical docs, k=1 keeps
    // the lower id (chars_kept pins which one survived)
    val tied = Seq(("s", 10L, "p q"), ("s", 11L, "p q r"))
      .toDF("source", "doc_id", "text")
    val t = TextAnalysis.sourceCapFunnel(tied, k = 1).collect()(0)
    assert(t.getLong(2) == 1L && t.getLong(4) == 3L,
      "equal-score tie must keep the lower doc_id")
  }

  test("lengthBuckets: hand-computed caps, padding, and waste; overflow clamps to the top edge") {
    val docs = Seq(
      (1L, "a b c"),                                   // len 3  -> cap 4
      (2L, "a b c d"),                                 // len 4  -> cap 4 (boundary: <=)
      (3L, "a b c d e"),                               // len 5  -> cap 8
      (4L, (1 to 8).map(_ => "t").mkString(" ")),      // len 8  -> cap 8
      (5L, (1 to 20).map(_ => "t").mkString(" ")))     // len 20 -> clamped to cap 8, len counted as 8
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.lengthBuckets(docs, Seq(4, 8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // cap 4: docs 1,2 -> tokens 3+4=7, padded 2*4-7=1, waste 1/8
    // cap 8: docs 3,4,5 -> tokens 5+8+8=21, padded 3*8-21=3, waste 3/24
    assert(got.toSeq == Seq(
      (4L, 2L, 7L, 1L, 0.125),
      (8L, 3L, 21L, 3L, 0.125)), got.toList.toString)
  }

  test("bm25TopDocs: hand-computed scores; tf saturation and length normalization rank correctly") {
    // corpus: 4 docs, query {cat}. df(cat)=3, N=4, dl = 4/4/8/4, avgdl=5
    val docs = Seq(
      (1L, "cat sat on mat"),          // tf=1, dl=4
      (2L, "cat cat cat cat"),         // tf=4, dl=4  — saturated, highest
      (3L, "cat sat on mat dog dog dog dog"), // tf=1, dl=8 — longer doc, lowest
      (4L, "dog ran far away"))        // no hit — absent
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bm25TopDocs(docs, Seq("cat"), topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    def bm25(tf: Double, dl: Double): Double = {
      val idf = math.log(((4.0 - 3.0 + 0.5) / (3.0 + 0.5)) + 1.0)
      val s = idf * ((tf * 2.2) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / 5.0))))
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.map(_._1).toSeq == Seq(2L, 1L, 3L), s"rank order: ${got.toList}")
    assert(got.map(t => t._1 -> t._3).toMap ==
      Map(2L -> bm25(4, 4), 1L -> bm25(1, 4), 3L -> bm25(1, 8)), got.toList.toString)
    assert(!got.map(_._1).contains(4L), "no-hit doc must be absent")
  }

  test("bm25TopDocs: multi-term scores sum per term; a rarer term outweighs a common one") {
    // {a}: df=3 (common); {z}: df=1 (rare). doc 30 has only z, doc 10 only a.
    val docs = Seq(
      (10L, "a b c d"), (20L, "a b c z"), (30L, "z z q q"), (40L, "a q q q"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bm25TopDocs(docs, Seq("a", "z"), topN = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 30 (rare term twice) must outrank every single-'a' doc
    assert(got(30L) > got(10L) && got(30L) > got(40L), got.toString)
    // doc 20 holds both terms: strictly more than its 'a'-only twin 10
    assert(got(20L) > got(10L), got.toString)
  }

  test("bm25QueryTable: single-term query reproduces bm25TopDocs exactly (quantization is a no-op for one term)") {
    val docs = Seq(
      (1L, "cat sat on mat"),
      (2L, "cat cat cat cat"),
      (3L, "cat sat on mat dog dog dog dog"),
      (4L, "dog ran far away"))
      .toDF("doc_id", "text")
    val q = Seq((7L, "cat")).toDF("query_id", "term")
    val got = graft.operators.TextAnalysis.bm25QueryTable(docs, q, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val ref = graft.operators.TextAnalysis.bm25TopDocs(docs, Seq("cat"), topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.map(t => (t._2, t._3, t._4, t._5)).toSeq == ref.toSeq,
      s"got=${got.toList} ref=${ref.toList}")
    assert(got.forall(_._1 == 7L))
  }

  test("bm25QueryTable: queries score independently in one pass; df=0 terms and no-match queries vanish") {
    val docs = Seq(
      (10L, "a b c d"), (20L, "a b c z"), (30L, "z z q q"), (40L, "a q q q"))
      .toDF("doc_id", "text")
    val q = Seq((1L, "a"), (1L, "z"), (2L, "z"), (3L, "nope"))
      .toDF("query_id", "term")
    val got = graft.operators.TextAnalysis.bm25QueryTable(docs, q, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
    val byQ = got.groupBy(_._1)
    // query 2 ({z} only): exactly the z-docs, rare-term doc 30 first
    assert(byQ(2L).sortBy(_._4).map(_._2).toSeq == Seq(30L, 20L), got.toList.toString)
    // query 1 ({a,z}): same rank order as the fixed-term path (ties are
    // far beyond the 1e-6 quantum here), scores within one quantum/term
    val ref = graft.operators.TextAnalysis.bm25TopDocs(docs, Seq("a", "z"), topN = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3)))
    assert(byQ(1L).sortBy(_._4).map(_._2).toSeq == ref.sortBy(_._3).map(_._1).toSeq)
    val refScores = ref.map(t => t._1 -> t._2).toMap
    byQ(1L).foreach { case (_, d, s, _) =>
      assert(math.abs(s - refScores(d)) <= 2.1e-6, s"doc $d: $s vs ${refScores(d)}") }
    // query 3's term hits nothing: the query contributes zero rows
    assert(!byQ.contains(3L), got.toList.toString)
  }

  test("assignContiguousIds: dense 0..n-1 ids in key order, from shuffled non-contiguous keys") {
    val keys = Seq(907L, 3L, 500L, 42L, 8L, 999L, 1L, 250L)
    val df = keys.map(k => (k, s"p$k")).toDF("k", "payload")
    val got = TextAnalysis.assignContiguousIds(df, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = keys.sorted.zipWithIndex.map { case (k, i) => (k, s"p$k", i.toLong) }
    assert(got.sortBy(_._3).toSeq == want, got.mkString(", "))
  }

  test("assignContiguousIds stays correct across partitions (the row_number trap)") {
    // the operator's no-arg repartitionByRange lets AQE right-size (at
    // sf0.001 that IS one partition — tiny data); pin an explicit count
    // to prove the offsets compose correctly when the data genuinely
    // spans partitions, as it always does at scale
    val df = graft.sources.Tables.documents(spark, sfTiny).select("doc_id")
    val ids = TextAnalysis.assignContiguousIds(df, "doc_id", numPartitions = Some(8))
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(ids.toSeq == ids.indices.map(_.toLong), "ids must be dense 0..n-1 in key order")
  }
}
