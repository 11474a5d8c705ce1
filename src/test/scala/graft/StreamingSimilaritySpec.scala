package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingSimilarity
import graft.streaming.StreamingSimilarity.VecEvent

class StreamingSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private def unit(axis: Int): Seq[Float] =
    Seq.tabulate(dim)(i => if (i == axis) 1.0f else 0.0f)
  private def jittered(axis: Int, eps: Float): Seq[Float] =
    Seq.tabulate(dim)(i => if (i == axis) 1.0f else eps)

  test("a later near-parallel vector is matched against earlier stream state") {
    val stream = MemoryStream[VecEvent](spark)
    val q = StreamingSimilarity.neighborsSeen(stream.toDF(), minCos = 0.9)
      .writeStream.format("memory").queryName("nbrs").outputMode("update").start()
    try {
      stream.addData(VecEvent(1L, unit(0)), VecEvent(2L, unit(7)))
      q.processAllAvailable()
      assert(spark.table("nbrs").count() == 0, "orthogonal vectors must not match")

      stream.addData(VecEvent(3L, jittered(0, 0.01f))) // cos vs vec 1 ≈ 0.997
      q.processAllAvailable()
      val hits = spark.table("nbrs").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(hits.exists { case (a, b, c) => a == 3L && b == 1L && c > 0.99 },
        s"near-parallel pair missed: $hits")
      assert(!hits.exists { case (a, b, _) => a == 2L || b == 2L },
        s"orthogonal vector matched: $hits")
    } finally q.stop()
  }

  test("streaming hits agree with the batch exact-cosine threshold on real embeddings") {
    val emb = graft.sources.Tables.embeddings(spark, sfTiny)
    import org.apache.spark.sql.functions._
    val rows = emb.select(col("vec_id"), col("embedding"))
      .collect().map(r => VecEvent(r.getLong(0), r.getSeq[Float](1)))
    // batch truth at a threshold where batch recall is certain enough:
    // all-pairs exact cosine (driver-side; tiny at sf0.001)
    val want = (for {
      a <- rows; b <- rows if a.vec_id < b.vec_id
      c = StreamingSimilarity.cosine(a.embedding, b.embedding)
      if c >= 0.45
    } yield Set(a.vec_id, b.vec_id)).toSet

    val stream = MemoryStream[VecEvent](spark)
    // 96×6 matches qs_embed_neardup's high-recall regime at cos 0.45
    val q = StreamingSimilarity.neighborsSeen(stream.toDF(), minCos = 0.45,
      numTables = 96, numBits = 6)
      .writeStream.format("memory").queryName("nbrs_real").outputMode("update").start()
    val got = try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { batch =>
        stream.addData(batch.toSeq); q.processAllAvailable()
      }
      spark.table("nbrs_real").collect()
        .map(r => Set(r.getLong(0), r.getLong(1))).toSet
    } finally q.stop()
    assert(got == want,
      s"missed=${(want -- got).take(3)} spurious=${(got -- want).take(3)}")
  }
}
