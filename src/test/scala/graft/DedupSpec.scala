package graft

import graft.operators.Dedup
import graft.sources.Tables

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val planted = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact dup of 0
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // near dup of 0
    (3L, "completely different words entirely unrelated content here now today friend"))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts under the min-id keeper") {
    val out = Dedup.exactDedup(planted, Seq("text"))
      .where($"members" > 1).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("keeper") == 0L)
    assert(out.head.getAs[Long]("members") == 2L)
  }

  test("ngram Jaccard: exact dup = 1.0, one-token edit ≈ 0.78, unrelated absent") {
    val pairs = Dedup.ngramJaccardPairs(planted, minJ = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val asMap = pairs.map { case (a, b, j) => (a, b) -> j }.toMap
    assert(asMap((0L, 1L)) == 1.0)
    assert(math.abs(asMap((0L, 2L)) - 7.0 / 9.0) < 1e-6)
    assert(!asMap.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("withNgramJaccardPairs: no cache entry outlives the call") {
    // n = 4 gives this test a canonicalized plan no other test shares, so
    // CacheManager must register a NEW entry (an identical plan would
    // silently reuse an earlier test's cache and hide the leak).
    // Compare RDD-ID SETS, not counts: earlier suites release their own
    // caches with the async default unpersist(blocking = false), and one
    // of those removals landing mid-test would shift a count-based
    // before/after comparison (observed as a rare full-suite flake). The
    // claim under test is only that entries CREATED by the loan are gone
    // when it returns — pre-existing entries may come and go freely.
    def cached: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val before = cached
    val rows = Dedup.withNgramJaccardPairs(planted, minJ = 0.5, n = 4) { pairs =>
      val out = pairs.collect()
      // while the loan is live, the shared shingle stream IS cached
      // (materialized by the collect above)
      assert((cached -- before).nonEmpty,
        "expected the internal persist to be registered during the loan")
      out
    }
    assert(rows.nonEmpty)
    assert((cached -- before).isEmpty,
      "the internal cache entry must be released when the loan returns")
    // release is exception-safe too
    intercept[RuntimeException] {
      Dedup.withNgramJaccardPairs(planted, minJ = 0.5, n = 4) { p =>
        p.count(); throw new RuntimeException("boom")
      }
    }
    assert((cached -- before).isEmpty)
  }

  test("minhash LSH finds the planted pairs (high-J recall)") {
    val pairs = Dedup.minhashPairs(planted, minJ = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash LSH == exact Jaccard pairs at J>=0.5 on real docs (sf0.001)") {
    val docs = Tables.documents(spark, sfTiny)
    val lsh = Dedup.minhashPairs(docs, minJ = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Dedup.ngramJaccardPairs(docs, minJ = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == exact, s"lsh-only=${lsh -- exact} exact-only=${exact -- lsh}")
  }

  test("simhash: identical docs at distance 0; radius-3 search is pigeonhole-exact") {
    val pairs = Dedup.simhashPairs(planted, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((0L, 1L)) == 0L)
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("native minhash_signature == aggregator reference path, bit for bit") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val docs = Tables.documents(spark, sfTiny)
    val native = docs.selectExpr("doc_id", "minhash_signature(text, 3, 64) AS sig")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaAgg = Dedup.minhashSignatureViaAgg(docs, 3, 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet == viaAgg.keySet)
    native.foreach { case (id, sig) =>
      assert(sig == viaAgg(id), s"signature mismatch for doc $id")
    }
  }

  test("dupClusters computes the transitive closure of near-dup pairs") {
    // chain 1-2-3 plus isolated pair 7-8: two clusters
    val pairs = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (7L, 8L, 1.0))
      .toDF("da", "db", "j")
    val got = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("dupClusters uses reliable checkpoints when a checkpoint dir is set") {
    // cluster mode: with a checkpoint dir configured, lineage cuts go to
    // the fault-tolerant store (recoverable after executor loss) instead
    // of executor-pinned localCheckpoint blocks — same answer either way
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val sc = spark.sparkContext
    sc.setCheckpointDir(dir)
    try {
      val pairs = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (7L, 8L, 1.0))
        .toDF("da", "db", "j")
      val got = Dedup.dupClusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
      // checkpoint data really landed in the reliable dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, s"no checkpoint files written under $dir")
    } finally sc.setCheckpointDir(null) // restore local mode for other specs
  }

  test("dupClusters on real sf0.01 near-dup pairs == in-memory union-find") {
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, sfSmall), minJ = 0.5)
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    // in-memory union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(x => x -> find(x)).toMap
    val got = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("stop-shingle cap (maxDocFreq) drops ubiquitous shingles but keeps true dups") {
    // the shared prefix shingles appear in 3 docs; cap at 2 still leaves
    // the exact-dup pair intact via its full shingle overlap
    val pairs = Dedup.ngramJaccardPairs(planted, minJ = 0.9, maxDocFreq = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("dupClusters converges on a 50-node path within the default maxIter (pointer doubling)") {
    // boilerplate corpora chain near-dups (doc i ~ doc i+1); plain
    // min-label propagation needs O(diameter)=49 rounds here and would
    // blow the default maxIter=10 — the pointer-doubling shortcut covers
    // the label distance geometrically, so this must converge AND be
    // correct (one cluster labeled by the min id)
    val chain = (1L until 50L).map(i => (i, i + 1, 1.0)).toDF("da", "db", "j")
    val got = Dedup.dupClusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 50 && got.values.forall(_ == 1L),
      s"path labeling wrong: ${got.toSeq.sortBy(_._1).take(8)}...")
  }

  test("dupClusters fails loudly when maxIter is too small for the graph diameter") {
    // a 12-node path needs ~log(diameter) rounds of min-label hops; with
    // maxIter = 1 the labeling is partial and MUST throw, not return
    // something that merely looks like components
    val chain = (1L until 12L).map(i => (i, i + 1, 1.0))
      .toDF("da", "db", "j")
    val e = intercept[IllegalStateException] {
      Dedup.dupClusters(chain, maxIter = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("a planted ubiquitous shingle no longer explodes the candidate pair count") {
    // 60 otherwise-unrelated docs all share a 4-token prefix, i.e. two
    // ubiquitous 3-grams (df=60 > cap): uncapped, those keys fan out
    // 60·59/2 = 1770 pairs at J = 2/14 ≈ 0.14; with the cap they
    // contribute none, and only the one real near-dup pair (ids 100/101)
    // survives.
    val hot = (0 until 60).map(i =>
      (i.toLong, s"the quick brown fox w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
    val dup = Seq(
      (100L, "zeta eta theta iota kappa lambda mu nu xi omicron"),
      (101L, "zeta eta theta iota kappa lambda mu nu xi pi"))
    val docs = (hot ++ dup).toDF("doc_id", "text")
    val capped = Dedup.ngramJaccardPairs(docs, minJ = 0.1,
      maxDocFreq = Dedup.NgramMaxDocFreq)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)),
      s"expected only the true near-dup pair, got ${capped.size} pairs")
    // sanity: the uncapped run DOES see the hot-shingle quadratic blowup
    val uncapped = Dedup.ngramJaccardPairs(docs, minJ = 0.1).count()
    assert(uncapped > 1000L, s"planted hot shingle should fan out uncapped: $uncapped")
  }

  private def spans(df: org.apache.spark.sql.DataFrame, k: Int) =
    Dedup.duplicatedSpans(df, k).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_tokens"))).toSet

  test("duplicatedSpans: planted cross-doc span found at exact boundaries; intra-doc repeat ignored") {
    val shared = (1 to 10).map(i => s"x$i").mkString(" ") // 10-token span
    val docs = Seq(
      (1L, s"a b c d e f g h $shared p q r"),  // span at tokens 8..17
      (2L, s"$shared z1 z2 z3 z4 z5 z6 z7 z8"), // span at tokens 0..9
      // an 8-token window repeated INSIDE one doc only: minDocs=2 distinct
      // docs must NOT flag it
      (3L, "r1 r2 r3 r4 r5 r6 r7 r8 m r1 r2 r3 r4 r5 r6 r7 r8"),
      (4L, "entirely unrelated filler words that never repeat anywhere at all"))
      .toDF("doc_id", "text")
    assert(spans(docs, k = 8) == Set(
      (1L, 8L, 17L, 10L),
      (2L, 0L, 9L, 10L)))
  }

  test("duplicatedSpans: covered intervals merge at gap <= k, split at gap > k") {
    val s1 = (1 to 8).map(i => s"a$i").mkString(" ")
    val s2 = (1 to 8).map(i => s"b$i").mkString(" ")
    // doc 1 carries s1 and s2 BACK TO BACK (window starts 0 and 8, gap
    // exactly k): the covered intervals [0,7] and [8,15] are adjacent —
    // one maximal span — even though the straddling windows are unique
    val adjacent = Seq(
      (1L, s"$s1 $s2"),
      (2L, s"$s1 u1 u2 u3 u4 u5 u6 u7 u8"), // donor of s1 only
      (3L, s"v1 v2 v3 v4 v5 v6 v7 v8 $s2")) // donor of s2 only
      .toDF("doc_id", "text")
    val got = spans(adjacent, k = 8)
    assert(got((1L, 0L, 15L, 16L)), s"adjacent covers must merge: $got")
    assert(got((2L, 0L, 7L, 8L)) && got((3L, 8L, 15L, 8L)))
    // one separating token (gap k+1): two distinct spans
    val split = Seq(
      (1L, s"$s1 gap $s2"), // window starts 0 and 9
      (2L, s"$s1 u1 u2 u3 u4 u5 u6 u7 u8"),
      (3L, s"v1 v2 v3 v4 v5 v6 v7 v8 $s2"))
      .toDF("doc_id", "text")
    val got2 = spans(split, k = 8)
    assert(got2((1L, 0L, 7L, 8L)) && got2((1L, 9L, 16L, 8L)),
      s"a gap wider than k must split spans: $got2")
  }

  test("duplicatedSpans: docs shorter than k tokens never participate") {
    val docs = Seq(
      (1L, "tiny identical doc"), (2L, "tiny identical doc"), // doc-level dup, no k-window
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9"), (4L, "c1 c2 c3 c4 c5 c6 c7 c8 c9"))
      .toDF("doc_id", "text")
    assert(spans(docs, k = 8) == Set(
      (3L, 0L, 8L, 9L), (4L, 0L, 8L, 9L)))
  }

  test("scrubDuplicatedSpans removes exactly the covered tokens, byte-exact") {
    val shared = (1 to 10).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (1L, s"a b c d e f g h $shared p q r"), // span tokens 8..17
      (2L, s"$shared z1 z2 z3 z4 z5 z6 z7 z8"), // span tokens 0..9
      (3L, "untouched words that appear nowhere else at all today"),
      (4L, "tiny doc")) // shorter than k: passes through whole
      .toDF("doc_id", "text")
    val got = Dedup.scrubDuplicatedSpans(docs, k = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("kept"), r.getAs[Long]("removed"), r.getAs[String]("fp")))).toMap
    def fp(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    assert(got(1L) == ((11L, 10L, fp("a b c d e f g h p q r"))))
    assert(got(2L) == ((8L, 10L, fp("z1 z2 z3 z4 z5 z6 z7 z8"))))
    assert(got(3L) == ((9L, 0L, fp("untouched words that appear nowhere else at all today"))))
    assert(got(4L) == ((2L, 0L, fp("tiny doc"))))
    // a fully-covered doc scrubs to the empty string, not a crash/null
    val full = Seq(
      (1L, shared), (2L, shared)).toDF("doc_id", "text")
    val g2 = Dedup.scrubDuplicatedSpans(full, k = 8).collect()
      .map(r => (r.getAs[Long]("kept"), r.getAs[String]("fp"))).toSet
    assert(g2 == Set((0L, fp(""))))
  }

  test("duplicatedSpans: seeded randomized differential vs a brute-force reference") {
    val rnd = new scala.util.Random(1234) // fixed seed: deterministic CI
    val k = 4
    for (trial <- 0 until 6) {
      // small vocab forces real cross-doc window collisions
      val vocab = Vector("a", "b", "c", "d", "e")
      val corpus = (1L to 20L).map { id =>
        val n = 2 + rnd.nextInt(18) // some docs shorter than k
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val docs = corpus.toDF("doc_id", "text")
      val got = spans(docs, k)
      // brute-force reference: enumerate every k-window, find those in
      // >= 2 distinct docs, merge covered intervals per doc
      val windows = corpus.flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        (0 to toks.length - k).map(p => (toks.slice(p, p + k).mkString(" "), id, p.toLong))
      }
      val dupWins = windows.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      val want = windows.filter(w => dupWins(w._1))
        .groupBy(_._2).flatMap { case (id, ws) =>
          val starts = ws.map(_._3).toSeq.sorted
          // merge covered intervals [p, p+k-1]: gap > k starts a new span
          val islands = starts.foldLeft(List.empty[(Long, Long)]) {
            case (Nil, p) => List((p, p))
            case ((a, b) :: rest, p) =>
              if (p - b > k) (p, p) :: (a, b) :: rest else (a, p) :: rest
          }
          islands.map { case (a, b) => (id, a, b + k - 1, b + k - a) }
        }.toSet
      assert(got == want, s"trial $trial: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("qt_substring_dup finds real spans on the corpus; plan has no cartesian join") {
    val q = Dedup.qtSubstringDup(spark, sfTiny)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"substring dedup degraded to all-pairs:\n$plan")
    val rows = q.collect()
    assert(rows.nonEmpty, "the corpus's planted near-dup docs must yield spans")
    rows.foreach { r =>
      assert(r.getAs[Long]("span_tokens") ==
        r.getAs[Long]("span_end") - r.getAs[Long]("span_start") + 1)
      assert(r.getAs[Long]("span_tokens") >= 8)
    }
  }

  test("containment is asymmetric: an excerpt scores 1.0 inside its container, not back") {
    // doc 0's trigram shingles are all present in doc 1 (a strict superset),
    // so C(0 in 1) = 1.0 while C(1 in 0) < 1 and Jaccard < 1
    val docs = Seq(
      (0L, "one two three four five"),
      (1L, "zero one two three four five six seven eight nine ten"),
      (2L, "totally unrelated words nothing shared here at all"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, minC = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((0L, 1L)) == 1.0)
    assert(out((1L, 0L)) < 1.0 && out((1L, 0L)) > 0.0)
    assert(!out.keySet.exists { case (a, b) => a == 2L || b == 2L })
    val j = Dedup.ngramJaccardPairs(docs, minJ = 0.0)
      .collect().map(r => r.getDouble(2))
    assert(j.forall(_ < 1.0), "Jaccard must dilute the excerpt pair containment flags")
  }

  test("fuzzyJoinLev equals brute force at k=1 and k=2, incl. insert/delete/empty edges") {
    val names = Seq(
      (1L, "kitten"), (2L, "sitten"), (3L, "sittin"),  // chain of distance-1 hops
      (4L, "kitte"),                                    // deletion neighbor of kitten
      (5L, "kittens"),                                  // insertion neighbor of kitten
      (6L, ""), (7L, "a"),                              // empty-string edge
      (8L, "zebra"))                                    // isolated
    val df = names.toDF("id", "name")
    for (k <- 1 to 2) {
      val got = Dedup.fuzzyJoinLev(df, "id", "name", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val brute = (for {
        (ia, sa) <- names; (ib, sb) <- names if ia < ib
        d = org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
          .apply(sa, sb).toLong
        if d <= k
      } yield (ia, ib, d)).toSet
      assert(got == brute,
        s"k=$k: missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    }
  }

  test("fuzzyJoinLev candidate generation is an equi-join, never a cross product") {
    val plan = Dedup.qdFuzzyJoin(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join degraded to all-pairs:\n$plan")
  }
}
