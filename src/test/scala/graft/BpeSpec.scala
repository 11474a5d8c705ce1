package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges: classic low/lower/lowest corpus, hand-computed merge sequence") {
    // tokens: low×3, lower×1, lowest×1. Pair counts:
    //   (l,o)=5 (o,w)=5 (w,e)=2 (e,r)=1 (e,s)=1 (s,t)=1
    // step 1: tie 5/5 breaks lexicographically -> "l o" (5), sym "lo"
    // step 2: "lo w" now counts 5 -> merged "low"
    // step 3: "low e" counts 2 -> merged "lowe"
    val docs = Seq((1L, "low low lower"), (2L, "lowest low"))
      .toDF("doc_id", "text")
    val rows = Bpe.learnMerges(docs, steps = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1, "l", "o", "lo", 5L),
      (2, "lo", "w", "low", 5L),
      (3, "low", "e", "lowe", 2L)), rows.mkString(", "))
  }

  test("learnMerges: left-to-right non-overlapping merge on runs (aaaa -> aa aa -> aaaa)") {
    // "aaaa": pairs (a,a)×3 -> merge "a a". BPE's left-to-right rule
    // turns the run into "aa aa" (NOT "aa a a" or a re-overlapping
    // "aaa a"), so step 2 must see exactly one (aa,aa) pair.
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val rows = Bpe.learnMerges(docs, steps = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1, "a", "a", "aa", 3L),
      (2, "aa", "aa", "aaaa", 1L)), rows.mkString(", "))
  }

  test("learnMerges: back-to-back pair occurrences both merge in one step") {
    // "xyxy": pairs (x,y)=2, (y,x)=1 -> merge "x y"; both occurrences
    // collapse in the same pass, so step 2 sees (xy,xy)=1.
    val docs = Seq((1L, "xyxy")).toDF("doc_id", "text")
    val rows = Bpe.learnMerges(docs, steps = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1, "x", "y", "xy", 2L),
      (2, "xy", "xy", "xyxy", 1L)), rows.mkString(", "))
  }

  test("encode: learned merges segment the corpus, in training order") {
    // merges (from the first test): lo, low, lowe. Segmentations:
    //   low    -> [low]          1 subword, 3 chars
    //   lower  -> [lowe, r]      2 subwords, 5 chars
    //   lowest -> [lowe, s, t]   3 subwords, 6 chars
    val docs = Seq((1L, "low low lower"), (2L, "lowest low"))
      .toDF("doc_id", "text")
    val rows = Bpe.encode(docs, steps = 3).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows(1L) == (3L, 11L, 4L, 2.75), rows(1L).toString)
    assert(rows(2L) == (2L, 9L, 4L, 2.25), rows(2L).toString)
  }

  test("learnMerges: frequency weighting beats within-word multiplicity") {
    // "ab" appears in 10 words' worth of frequency; "cd" only in one
    // word but that word repeats the pair twice. Weighted counts:
    // (a,b) = 10, (c,d) = 2×1 = 2 -> "a b" must win.
    val docs = Seq((1L, Seq.fill(10)("ab").mkString(" ") + " cdcd"))
      .toDF("doc_id", "text")
    val first = Bpe.learnMerges(docs, steps = 1).collect()(0)
    assert((first.getString(1), first.getString(2), first.getLong(4)) == ("a", "b", 10L),
      first.toString)
  }
}
