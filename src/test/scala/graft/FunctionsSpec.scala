package graft

import graft.functions.GraftFunctions

class FunctionsSpec extends SparkSpec {

  test("simhash64 is callable from SQL and deterministic") {
    GraftFunctions.ensureRegistered(spark)
    val a = spark.sql("SELECT simhash64(array('alpha', 'beta', 'gamma')) AS h")
      .collect().head.getLong(0)
    val b = spark.sql("SELECT simhash64(array('alpha', 'beta', 'gamma')) AS h")
      .collect().head.getLong(0)
    assert(a == b)
    // one-token change flips few bits; disjoint tokens flip many
    val near = spark.sql("SELECT simhash64(array('alpha', 'beta', 'delta')) AS h")
      .collect().head.getLong(0)
    val far = spark.sql("SELECT simhash64(array('xx', 'yy', 'zz')) AS h")
      .collect().head.getLong(0)
    assert(java.lang.Long.bitCount(a ^ near) < java.lang.Long.bitCount(a ^ far))
  }

  test("simhash64 survives whole-stage codegen (no interpreted fallback errors)") {
    GraftFunctions.ensureRegistered(spark)
    // must read from a real source: a LocalRelation would be constant-
    // folded at optimization time and never reach codegen
    val df = graft.sources.Tables.documents(spark, sfTiny)
      .selectExpr("doc_id", "simhash64(split(text, ' ')) AS h")
    // `*(n)` marks a WholeStageCodegen span in the physical plan string;
    // the simhash projection must sit inside one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("simhash64")),
      s"simhash64 not inside a codegen span:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.map(_.getLong(1)).distinct.length > 1)
  }

  test("simhash64 rejects wrong input type at analysis") {
    GraftFunctions.ensureRegistered(spark)
    intercept[Exception] {
      spark.sql("SELECT simhash64(42)").collect()
    }
  }

  test("zorder_key bit-interleaving matches the naive per-bit reference") {
    import graft.functions.ZOrderUtil
    def naive(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 31) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val rng = new scala.util.Random(11)
    for (_ <- 0 until 2000) {
      val a = rng.nextLong() & 0x7FFFFFFFL
      val b = rng.nextLong() & 0x7FFFFFFFL
      assert(ZOrderUtil.interleave(a, b) == naive(a, b), s"($a, $b)")
      assert(ZOrderUtil.interleave(a, b) >= 0L, "must stay non-negative for signed ordering")
    }
    // SQL-registered form agrees with the kernel
    GraftFunctions.ensureRegistered(spark)
    val viaSql = spark.sql("SELECT zorder_key(5L, 9L)").collect().head.getLong(0)
    assert(viaSql == ZOrderUtil.interleave(5L, 9L))
  }

  test("pq_adc == the HOF formulation bit for bit; malformed inputs answer NaN") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val rng = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val m = 8
      val codes = Array.fill(m)(rng.nextInt(16))
      val lut = Array.fill(m)(Array.fill(16)(rng.nextDouble() * 2 - 1).toSeq).toSeq
      (i.toLong, codes.toSeq, lut)
    }.toDF("id", "codes", "lut")
    val both = rows.selectExpr(
      "pq_adc(codes, lut) AS native",
      "aggregate(zip_with(codes, lut, (c, t) -> t[c]), 0D, (a, x) -> a + x) AS hof")
      .collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}")
    }
    // stays inside whole-stage codegen (repartition blocks the
    // LocalRelation constant-fold that would evaluate it at plan time;
    // collect first — AQE shows codegen spans only in the final plan)
    val codegenDf = rows.repartition(2).selectExpr("pq_adc(codes, lut) AS s")
    codegenDf.collect()
    val p = codegenDf.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("pq_adc")),
      s"pq_adc fell out of codegen:\n$p")
    // malformed: subspace mismatch and out-of-range code both answer NaN
    val bad = Seq(
      (Seq(0, 1), Seq(Seq(1.0, 2.0))), // 2 codes, 1 lut row
      (Seq(5), Seq(Seq(1.0, 2.0)))) // code 5 outside a 2-entry lut
      .toDF("codes", "lut")
    bad.selectExpr("pq_adc(codes, lut) AS s").collect()
      .foreach(r => assert(r.getDouble(0).isNaN))
  }

  test("pq_encode == the HOF encode bit for bit on the real corpus; codegen; malformed nulls out") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val e = graft.sources.Tables.embeddings(spark, sfTiny).select("vec_id", "embedding")
    val model = graft.operators.Similarity.trainPq(e, m = 8, nbits = 4)
    val native = graft.operators.Similarity.pqEncode(e, model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val hof = graft.operators.Similarity.pqEncodeHof(e, model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(native.nonEmpty && native == hof,
      s"native/HOF disagree: ${native.toSeq.diff(hof.toSeq).take(3)}")
    // stays inside whole-stage codegen
    val cb = model.codebooks.map(_.map(_.toSeq).toSeq).toSeq
    val rows = (1 to 50).map(i => (i.toLong,
      Array.fill(64)(i * 0.01f).toSeq)).toDF("id", "v").repartition(2)
      .withColumn("cb", org.apache.spark.sql.functions.typedlit(cb))
      .selectExpr("pq_encode(v, cb) AS codes")
    rows.collect()
    val p = rows.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("pq_encode")),
      s"pq_encode fell out of codegen:\n$p")
    // a vector shorter than m·subDim nulls out instead of crashing
    val bad = Seq((1L, Seq(0.5f, 0.5f))).toDF("id", "v")
      .withColumn("cb", org.apache.spark.sql.functions.typedlit(cb))
      .selectExpr("pq_encode(v, cb) AS codes").collect()
    assert(bad.head.isNullAt(0), "short vector must encode to null")
  }

  test("unicode_norm: published UAX #15 answers, null-safe, literal-form contract") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    // decomposed e+◌́ composes to é (1 code point); ﬁ folds only under
    // the K forms; ASCII is a no-op in every form
    val rows = spark.sql(
      "SELECT unicode_norm('é', 'NFC') AS nfc, " +
        "unicode_norm('é', 'NFD') AS nfd, " +
        "unicode_norm('ﬁx', 'NFKC') AS nfkc, " +
        "unicode_norm('ﬁx', 'NFC') AS nfc_lig, " +
        "unicode_norm('plain', 'NFC') AS ascii, " +
        "unicode_norm(CAST(NULL AS STRING), 'NFC') AS nul").collect().head
    assert(rows.getString(0) == "é")
    assert(rows.getString(1) == "é")
    assert(rows.getString(2) == "fix")
    assert(rows.getString(3) == "ﬁx")
    assert(rows.getString(4) == "plain")
    assert(rows.isNullAt(5))
    val e = intercept[Exception] {
      spark.sql("SELECT unicode_norm('x', 'NFX')").collect()
    }
    assert(e.getMessage.contains("unknown form"), e.getMessage)
    // form must be a literal — it is resolved at plan time
    val e2 = intercept[Exception] {
      Seq(("a", "NFC")).toDF("s", "f").selectExpr("unicode_norm(s, f)").collect()
    }
    assert(e2.getMessage.contains("string literal"), e2.getMessage)
  }

  test("strip_accents: marks drop, non-decomposable letters survive") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT strip_accents('café naïve Å ø ß é') AS s")
      .collect().head.getString(0)
    assert(r == "cafe naive A ø ß e")
  }

  test("unicode_norm and strip_accents stay inside whole-stage codegen") {
    GraftFunctions.ensureRegistered(spark)
    val df = graft.sources.Tables.documents(spark, sfTiny)
      .selectExpr("unicode_norm(text, 'NFC') AS n", "strip_accents(text) AS st")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("unicode_norm")),
      s"unicode_norm not inside a codegen span:\n$plan")
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("strip_accents")),
      s"strip_accents not inside a codegen span:\n$plan")
    assert(df.collect().nonEmpty)
  }

  test("bpe_expand ≡ regexp_replace(w, '(.)', '$1  ') on the real corpus and edge cases") {
    GraftFunctions.ensureRegistered(spark)
    import org.apache.spark.sql.functions._
    // the regex form bpe_expand replaces — bit-equality is the contract
    // that keeps the DuckDB oracle (still regexp-based) hash-green
    val corpus = graft.sources.Tables.documents(spark, sfSmall)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val mismatch = corpus
      .select(col("w"), call_function("bpe_expand", col("w")).as("fast"),
        regexp_replace(col("w"), "(.)", "$1  ").as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(mismatch.isEmpty, s"bpe_expand diverges: ${mismatch.head(3).mkString(", ")}")
    // edge cases the corpus may not cover: empty, multibyte codepoints,
    // line terminators (regex `.` skips them — so must bpe_expand)
    val edges = Seq("", "a", "héllo", "日本語", "a\nb", "x\ry", " ", "ef",
      "😀ok") // surrogate pair (U+1F600)
    import spark.implicits._
    val edf = edges.toDF("w")
      .select(col("w"), call_function("bpe_expand", col("w")).as("fast"),
        regexp_replace(col("w"), "(.)", "$1  ").as("ref"))
    edf.collect().foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"bpe_expand('${r.getString(0)}') = '${r.getString(1)}' != '${r.getString(2)}'")
    }
  }

  test("bpe_expand: a truncated multi-byte tail is never a line terminator") {
    import org.apache.spark.unsafe.types.UTF8String
    // 0xE0 with ONE tail byte whose low 6 bits are 0x0A: decoding the
    // clamped pair as a codepoint would yield '\n' and skip the doubled
    // spaces; the regex form sees U+FFFD (not a terminator) — so the
    // byte loop must append the spaces too
    val malformed = Array(0xE0.toByte, 0x8A.toByte)
    val out = graft.functions.BpeExpandUtil.expand(UTF8String.fromBytes(malformed))
    val bytes = out.getBytes
    assert(bytes.length == 4 &&
      bytes(0) == malformed(0) && bytes(1) == malformed(1) &&
      bytes(2) == ' '.toByte && bytes(3) == ' '.toByte,
      s"clamped tail mishandled: ${bytes.map(b => f"${b & 0xFF}%02x").mkString(" ")}")
    // lone truncated 4-byte lead at end of an otherwise-normal string
    val mixed = "ab".getBytes("UTF-8") :+ 0xF0.toByte
    val out2 = graft.functions.BpeExpandUtil.expand(UTF8String.fromBytes(mixed))
    assert(out2.toString.startsWith("a  b  "), out2.toString)
    assert(out2.getBytes.takeRight(2).forall(_ == ' '.toByte), "lead byte must gain spaces")
  }

  test("BpeVocab rejects NUL-bearing merge symbols at construction (rank-map aliasing)") {
    val ex = intercept[IllegalArgumentException] {
      new graft.functions.BpeVocab(Array("a\u0000b"), Array("c"))
    }
    assert(ex.getMessage.contains("NUL"), ex.getMessage)
    // NUL-free symbols construct fine and encode is unaffected
    val v = new graft.functions.BpeVocab(Array("a"), Array("b"))
    val r = v.encode(org.apache.spark.unsafe.types.UTF8String.fromString("aab"))
    assert(r.array.map(_.toString).toSeq == Seq("a", "ab"), r.array.mkString(","))
  }

  test("cov_accum_agg rejects null vector ELEMENTS loudly (no silent 0.0 absorption)") {
    GraftFunctions.ensureRegistered(spark)
    val e = intercept[Throwable] {
      spark.sql("SELECT cov_accum_agg(v, 2) FROM VALUES " +
        "(array(CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE))), " +
        "(array(CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE))) AS t(v)").collect()
    }
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("null element"), messages)
    // whole-row nulls are still skipped (the existing contract)
    val ok = spark.sql("SELECT cov_accum_agg(v, 2) AS b FROM VALUES " +
      "(CAST(NULL AS ARRAY<DOUBLE>)), " +
      "(array(CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE))) AS t(v)").collect()
    assert(ok.head.getAs[Array[Byte]](0) != null)
  }

  test("bpe_expand sits inside a whole-stage codegen span") {
    GraftFunctions.ensureRegistered(spark)
    import org.apache.spark.sql.functions._
    val df = graft.sources.Tables.documents(spark, sfTiny)
      .selectExpr("bpe_expand(text) AS r")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("bpe_expand")),
      s"bpe_expand not inside a codegen span:\n$plan")
    assert(df.filter(col("r") =!= "").count() > 0)
  }
}
