package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Greedy sequence packing ([[TextAnalysis.packGreedy]]): the strict
  * (no-straddle) twin of the qp_pack token-stream chunking. No SQL oracle
  * can express a sequential greedy scan, so the contract is pinned as
  * invariants plus a differential against a single-threaded reference
  * packer run on the collected shard.
  */
class PackingSpec extends SparkSpec {

  private val cap = 512L

  private def docsWithToks = {
    val d = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_toks"))
    d
  }

  /** Single-threaded reference: greedy next-fit in id order. */
  private def referencePack(docs: Seq[(Long, Long)], capacity: Long): Map[Long, Long] = {
    var bin = 0L; var used = 0L; var first = true
    docs.sortBy(_._1).map { case (id, toks) =>
      if (!first && used + toks > capacity) { bin += 1; used = 0L }
      first = false
      used += toks
      id -> bin
    }.toMap
  }

  test("every bin respects capacity unless it holds a single oversized doc") {
    val packed = TextAnalysis.packGreedy(docsWithToks, cap, shards = 4)
    val bad = packed.groupBy("bin")
      .agg(sum("n_toks").as("toks"), count(lit(1)).as("docs"))
      .filter(col("toks") > cap && col("docs") > 1)
      .count()
    assert(bad == 0L)
  }

  test("all docs packed exactly once; bins are contiguous id ranges") {
    val in = docsWithToks.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val packed = TextAnalysis.packGreedy(docsWithToks, cap, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(packed.map(_._1).sorted.toSeq == in.map(_._1).sorted.toSeq)
    // within a bin, ids form a contiguous run of the packed order: no doc
    // from a LATER bin has a smaller id than one from an earlier bin
    // (within the same shard, i.e. same high 32 bits of the bin id)
    for ((_, group) <- packed.groupBy(_._3 >> 32)) {
      val byId = group.sortBy(_._1)
      assert(byId.map(_._3).sameElements(byId.map(_._3).sorted),
        "bin ids must be monotone in doc order within a shard")
    }
  }

  test("matches the single-threaded reference packer shard by shard") {
    val packed = TextAnalysis.packGreedy(docsWithToks, cap, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((_, group) <- packed.groupBy(_._3 >> 32)) {
      val ref = referencePack(group.map(g => (g._1, g._2)).toSeq, cap)
      // compare bin STRUCTURE (local seq), not raw ids
      val got = group.sortBy(_._1).map(g => g._3 & 0xFFFFFFFFL)
      val want = group.sortBy(_._1).map(g => ref(g._1))
      assert(got.sameElements(want))
    }
  }

  test("deterministic across runs and bin count is near-optimal") {
    val a = TextAnalysis.packGreedy(docsWithToks, cap, shards = 4).collect().toSet
    val b = TextAnalysis.packGreedy(docsWithToks, cap, shards = 4).collect().toSet
    assert(a == b)
    val totalToks = docsWithToks.agg(sum("n_toks")).collect()(0).getLong(0)
    val bins = a.map(_.getLong(2)).size
    val optimal = math.ceil(totalToks.toDouble / cap).toLong
    // next-fit uses < 2x optimal bins, +1 partial bin per shard boundary
    assert(bins <= 2 * optimal + 4, s"bins=$bins optimal=$optimal")
  }

  test("oversized doc gets its own bin without starving neighbors") {
    import spark.implicits._
    val docs = Seq((1L, 100L), (2L, 9999L), (3L, 100L), (4L, 100L))
      .toDF("doc_id", "n_toks")
    val packed = TextAnalysis.packGreedy(docs, capacity = 512L, shards = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(packed(1L) != packed(2L))
    assert(packed(2L) != packed(3L))
    assert(packed(3L) == packed(4L))
  }

  test("qp_chunk: windows cover every token, overlap by chunk-stride, fingerprints match content") {
    val chunk = 64; val stride = 48
    val rows = TextAnalysis.qpChunk(spark, sfTiny, chunk, stride).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val docs = Tables.documents(spark, sfTiny)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    assert(rows.map(_._1).toSet == docs.keySet, "every doc chunks")
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val toks = docs(id)
      val sorted = cs.sortBy(_._2)
      // chunk count = the start-walk formula; indices contiguous from 0
      assert(sorted.map(_._2).toSeq == (0L until ((toks.length - 1) / stride + 1)), s"doc $id")
      sorted.foreach { case (_, i, nTok, fp) =>
        val want = toks.slice((i * stride).toInt, (i * stride).toInt + chunk)
        assert(nTok == want.length, s"doc $id chunk $i")
        assert(fp == java.security.MessageDigest.getInstance("MD5")
          .digest(want.mkString(" ").getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString, s"doc $id chunk $i fingerprint")
      }
      // coverage: the last chunk reaches the last token
      val (_, lastI, lastN, _) = sorted.last
      assert(lastI * stride + lastN == toks.length, s"doc $id tail coverage")
    }
  }
}
