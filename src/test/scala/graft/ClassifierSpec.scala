package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

class ClassifierSpec extends SparkSpec {

  /** Straight-line in-memory batch perceptron over the SAME integer
    * features, as the model oracle: collect the feature rows once, run
    * the four rounds as plain Scala loops, compare the whole trajectory
    * row-for-row. Catches any drift between the distributed aggregate
    * formulation and the algorithm it claims to be. */
  test("distributed trajectory == in-memory batch perceptron on the real corpus") {
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select("doc_id", "text", "lang").collect()
    def occ(s: String, g: String): Long =
      ((s.length - s.replace(g, "").length) / g.length).toLong
    val stop = Set("the", "a", "of", "to", "and")
    case class F(y: Long, x: Array[Long], train: Boolean)
    val feats = docs.map { r =>
      val text = r.getString(1)
      F(if (r.getString(2) == "en") 1L else -1L,
        Array(1L,
          text.split(" ", -1).length.toLong,
          text.split(" ", -1).count(stop).toLong,
          occ(text, "th"), occ(text, "de ")),
        r.getLong(0) % 2 == 0)
    }
    var w = Array.fill(5)(0L)
    val want = (1 to 4).map { t =>
      val mis = feats.filter(f => f.train &&
        f.y * f.x.zip(w).map { case (a, b) => a * b }.sum <= 0)
      w = Array.tabulate(5)(i => w(i) + mis.map(f => f.y * f.x(i)).sum)
      val held = feats.filterNot(_.train)
      val correct = held.count(f =>
        f.y * f.x.zip(w).map { case (a, b) => a * b }.sum > 0)
      (t.toLong, mis.length.toLong, w.toSeq, correct.toLong, held.length.toLong)
    }
    val got = Classifier.qcPerceptron(spark, sfTiny).collect().map(r =>
      (r.getLong(0), r.getLong(1), (2 to 6).map(r.getLong), r.getLong(7), r.getLong(8)))
    assert(got.toSeq == want, s"trajectory drift:\n got=${got.toSeq}\nwant=$want")
    // sanity on the learning itself: round-1 updates = the whole training
    // split (zero weights misclassify everything), and the trajectory is
    // not degenerate (weights actually moved)
    assert(want.head._2 == feats.count(_.train))
    assert(want.last._3.exists(_ != 0L))
  }

  /** In-memory sweep oracle: replay training to final weights, score
    * every doc, sort by (score, doc_id), assign SQL-spec ntile buckets
    * (first N mod 10 buckets get the extra row), aggregate. Pins both
    * the distributed-rank device and the closed-form bucket math. */
  test("score sweep == in-memory ntile(10) over the trained scorer") {
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select("doc_id", "text", "lang").collect()
    def occ(s: String, g: String): Long =
      ((s.length - s.replace(g, "").length) / g.length).toLong
    val stop = Set("the", "a", "of", "to", "and")
    val feats = docs.map { r =>
      val text = r.getString(1)
      (r.getLong(0),
        if (r.getString(2) == "en") 1L else -1L,
        Array(1L, text.split(" ", -1).length.toLong,
          text.split(" ", -1).count(stop).toLong,
          occ(text, "th"), occ(text, "de ")),
        r.getLong(0) % 2 == 0)
    }
    var w = Array.fill(5)(0L)
    (1 to 4).foreach { _ =>
      val mis = feats.filter(f => f._4 &&
        f._2 * f._3.zip(w).map { case (a, b) => a * b }.sum <= 0)
      w = Array.tabulate(5)(i => w(i) + mis.map(f => f._2 * f._3(i)).sum)
    }
    val scored = feats.map(f =>
      (f._1, f._2, f._3.zip(w).map { case (a, b) => a * b }.sum))
      .sortBy(t => (t._3, t._1))
    val n = scored.length
    val (big, rem) = (n / 10 + 1, n % 10)
    val deciled = scored.zipWithIndex.map { case ((_, y, s), i) =>
      val r = i + 1L
      val d = if (r <= rem.toLong * big) (r - 1) / big + 1
              else rem + (r - rem.toLong * big - 1) / (big - 1) + 1
      (d, y, s)
    }
    val want = deciled.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, g) =>
      (d, g.length.toLong, g.count(_._2 == 1L).toLong, g.map(_._3).min, g.map(_._3).max)
    }
    val got = Classifier.qcScoreSweep(spark, sfTiny).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, s"sweep drift:\n got=$got\nwant=$want")
    assert(got.map(_._2).sum == n.toLong)
  }

  /** The definitional check: AUC is the probability a random positive
    * outscores a random negative (ties count half). Brute-force every
    * (pos, neg) heldout pair and demand the rank-formula operator
    * reproduce 2·U exactly, plus the same final double. */
  test("auc == brute-force pairwise comparisons on the heldout split") {
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select("doc_id", "text", "lang").collect()
    def occ(s: String, g: String): Long =
      ((s.length - s.replace(g, "").length) / g.length).toLong
    val stop = Set("the", "a", "of", "to", "and")
    val feats = docs.map { r =>
      val text = r.getString(1)
      (if (r.getString(2) == "en") 1L else -1L,
        Array(1L, text.split(" ", -1).length.toLong,
          text.split(" ", -1).count(stop).toLong,
          occ(text, "th"), occ(text, "de ")),
        r.getLong(0) % 2 == 0)
    }
    var w = Array.fill(5)(0L)
    (1 to 4).foreach { _ =>
      val mis = feats.filter(f => f._3 &&
        f._1 * f._2.zip(w).map { case (a, b) => a * b }.sum <= 0)
      w = Array.tabulate(5)(i => w(i) + mis.map(f => f._1 * f._2(i)).sum)
    }
    val held = feats.filterNot(_._3)
      .map(f => (f._1, f._2.zip(w).map { case (a, b) => a * b }.sum))
    val p = held.count(_._1 == 1L).toLong
    val nn = held.length - p
    var u2 = 0L
    for ((yi, si) <- held if yi == 1L; (yj, sj) <- held if yj == -1L)
      u2 += (if (si > sj) 2L else if (si == sj) 1L else 0L)
    val row = Classifier.qcAuc(spark, sfTiny).head
    assert((row.getLong(0), row.getLong(1)) == ((p, nn)))
    assert(row.getLong(2) == u2, s"auc_num2 ${row.getLong(2)} != 2U $u2")
    assert(row.getDouble(3) == u2.toDouble / (2.0 * p.toDouble * nn.toDouble))
  }

  test("confusion matrix == trajectory's round-4 heldout confusion") {
    // cross-operator consistency: qcPerceptron already reports heldout
    // correct/total under the final weights; the confusion matrix must
    // decompose the same numbers (correct = tp + tn, total = all four)
    val r4 = Classifier.qcPerceptron(spark, sfTiny)
      .filter(col("round") === 4).head
    val cm = Classifier.qcConfusion(spark, sfTiny).head
    val (tp, fp, fn, tn) =
      (cm.getLong(0), cm.getLong(1), cm.getLong(2), cm.getLong(3))
    assert(tp + tn == r4.getLong(7), "tp+tn must equal round-4 held_correct")
    assert(tp + fp + fn + tn == r4.getLong(8), "cells must sum to held_total")
    val precision = if (tp == 0L) 0.0 else tp.toDouble / (tp + fp).toDouble
    val recall = if (tp == 0L) 0.0 else tp.toDouble / (tp + fn).toDouble
    val f1 = if (tp == 0L) 0.0
             else 2.0 * precision * recall / (precision + recall)
    assert(cm.getDouble(4) == precision)
    assert(cm.getDouble(5) == recall)
    assert(cm.getDouble(6) == f1)
  }

  test("feature extraction is integer-exact and split is by doc-id parity") {
    val f = graft.sources.Tables.documents(spark, sfTiny)
      .select(col("doc_id"), (col("doc_id") % 2 === 0).as("expect_train"))
    // the public query output carries the split only implicitly; pin the
    // heldout total against an independent count
    val heldTotal = f.filter(!col("expect_train")).count()
    val row = Classifier.qcPerceptron(spark, sfTiny).filter(col("round") === 1).head
    assert(row.getLong(8) == heldTotal, s"heldout total ${row.getLong(8)} != $heldTotal")
  }
}
