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
}
