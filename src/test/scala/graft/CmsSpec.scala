package graft

import org.apache.spark.sql.functions._
import graft.functions.CmsUtil
import graft.operators.Sketches
import graft.sources.Tables

/** Count-min sketch correctness: the kernel's guarantees (one-sidedness,
  * ε·N band, exact merge), the stored-partials path, and the
  * self-certifying row. The SQL oracle only pins the exact top-k side;
  * the sketch-level claims live here (the SketchesSpec discipline). */
class CmsSpec extends SparkSpec {

  private def tokenCounts(d: String): Map[String, Long] =
    Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("kernel: estimate >= exact for EVERY key, and within eps*N for all") {
    val counts = tokenCounts(sfTiny)
    val sk = new CmsUtil.Sketch(6, 16384)
    counts.foreach { case (t, n) =>
      val h = xxhash(t)
      var i = 0L
      while (i < n) { sk.update(h, 1L); i += 1 }
    }
    val eps = 2.0 * math.E / 16384
    counts.foreach { case (t, n) =>
      val est = sk.estimate(xxhash(t))
      assert(est >= n, s"one-sidedness violated for '$t': est $est < exact $n")
      assert(est <= n + math.ceil(sk.total * eps).toLong,
        s"eps*N band violated for '$t': est $est vs exact $n, N=${sk.total}")
    }
  }

  /** Spark's xxhash64 of a UTF-8 string with the default seed 42 — the
    * same value `xxhash64(col)` produces in the plans. */
  private def xxhash(s: String): Long = {
    val utf8 = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(utf8.getBaseObject, utf8.getBaseOffset, utf8.numBytes(), 42L)
  }

  test("merging per-split partials is BIT-identical to one direct sketch") {
    val merged = Sketches.tokenCmsBySplit(spark, sfTiny)
      .agg(call_function("cms_merge_agg", col("sk")).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val direct = Tables.documents(spark, sfTiny)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .agg(call_function("cms_agg", xxhash64(col("token")), lit(6), lit(16384)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(merged, direct),
      "elementwise-sum merge must reproduce the direct sketch byte-for-byte")
  }

  test("stored partials survive a parquet round trip and re-aggregate") {
    val dir = java.nio.file.Files.createTempDirectory("cms").toString
    try {
      Sketches.tokenCmsBySplit(spark, sfTiny).write.mode("overwrite").parquet(dir)
      val back = spark.read.parquet(dir)
        .agg(call_function("cms_merge_agg", col("sk")).as("sk"),
          sum("n_tokens").as("n"))
        .select(call_function("cms_total", col("sk")).as("total"), col("n"))
        .head()
      assert(back.getLong(0) == back.getLong(1),
        s"stored-sketch total ${back.getLong(0)} != token count ${back.getLong(1)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("sketch bytes are invariant to row order and partitioning") {
    val toks = Tables.documents(spark, sfTiny)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    def bytes(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(call_function("cms_agg", xxhash64(col("token")), lit(4), lit(1024)).as("sk"))
        .head().getAs[Array[Byte]]("sk")
    val a = bytes(toks)
    val b = bytes(toks.repartition(17).sortWithinPartitions(col("token").desc))
    assert(java.util.Arrays.equals(a, b))
  }

  test("empty input yields a zero sketch; estimates read 0; merge adopts dims") {
    val empty = Tables.documents(spark, sfTiny)
      .filter(lit(false))
      .select(explode(split(col("text"), " ")).as("token"))
      .agg(call_function("cms_agg", xxhash64(col("token")), lit(6), lit(16384)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(CmsUtil.estimate(empty, 12345L) == 0L)
    assert(CmsUtil.total(empty) == 0L)
    // a zero-count sketch still round-trips and updates correctly
    val real = CmsUtil.deserialize(empty)
    real.update(99L, 3L)
    assert(CmsUtil.deserialize(real.serialize).estimate(99L) == 3L)
  }

  test("mismatched stored dims fail loudly on merge") {
    val a = new CmsUtil.Sketch(4, 1024)
    val b = new CmsUtil.Sketch(6, 16384)
    val e = intercept[IllegalArgumentException](a.mergeIn(b))
    assert(e.getMessage.contains("mismatched"))
  }

  test("qk_cms_topk: both certification booleans true at tiny and small SF") {
    Seq(sfTiny, sfSmall).foreach { d =>
      val rows = Sketches.qkCmsTopk(spark, d).collect()
      assert(rows.length == 20)
      rows.foreach { r =>
        assert(r.getAs[Boolean]("cms_ge_exact"), s"$d: $r")
        assert(r.getAs[Boolean]("cms_within_eps"), s"$d: $r")
      }
    }
  }
}
