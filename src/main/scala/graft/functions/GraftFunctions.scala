package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Builders for the engine's native expressions, shared by
  * [[graft.GraftExtensions]] (session-build-time injection) and
  * [[GraftFunctions.ensureRegistered]] (runtime registration).
  */
object FunctionBuilders {

  private def intLiteral(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def stringLiteral(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def stringArrayLiteral(e: Expression, what: String): Array[String] = e match {
    case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData, _) if v != null =>
      v.toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString)
    case other => throw new IllegalArgumentException(
      s"$what must be an array<string> literal, got $other")
  }

  val all: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("simhash64", classOf[SimHash64],
      (c: Seq[Expression]) => SimHash64(c.head)),
    ("cosine_similarity", classOf[CosineSimilarity],
      (c: Seq[Expression]) => CosineSimilarity(c(0), c(1))),
    ("pq_adc", classOf[PqAdc],
      (c: Seq[Expression]) => PqAdc(c(0), c(1))),
    ("pq_encode", classOf[PqEncode],
      (c: Seq[Expression]) => PqEncode(c(0), c(1))),
    ("cosine_lsh_sketch", classOf[CosineLshSketch],
      (c: Seq[Expression]) => CosineLshSketch(c(0),
        intLiteral(c(1), "numTables"), intLiteral(c(2), "numBits"))),
    ("word_shingles", classOf[WordShingles],
      (c: Seq[Expression]) => WordShingles(c(0), intLiteral(c(1), "n"))),
    ("bpe_expand", classOf[BpeExpand],
      (c: Seq[Expression]) => BpeExpand(c(0))),
    ("bpe_apply", classOf[BpeApply],
      (c: Seq[Expression]) => BpeApply(c(0), new BpeVocab(
        stringArrayLiteral(c(1), "merge left symbols"),
        stringArrayLiteral(c(2), "merge right symbols")))),
    ("minhash_signature", classOf[MinHashSignature],
      (c: Seq[Expression]) => MinHashSignature(c(0),
        intLiteral(c(1), "n"), intLiteral(c(2), "k"))),
    ("topk_pairs", classOf[BoundedTopK],
      (c: Seq[Expression]) => BoundedTopK(c(0), c(1),
        intLiteral(c(2), "k")).toAggregateExpression()),
    ("zorder_key", classOf[ZOrderKey],
      (c: Seq[Expression]) => ZOrderKey(c(0), c(1))),
    ("hilbert_key", classOf[HilbertKey],
      (c: Seq[Expression]) => HilbertKey(c(0), c(1))),
    ("geohash", classOf[GeohashEncode],
      (c: Seq[Expression]) => GeohashEncode(c(0), c(1),
        intLiteral(c(2), "chars"))),
    ("unicode_norm", classOf[UnicodeNorm],
      (c: Seq[Expression]) => UnicodeNorm(c(0), stringLiteral(c(1), "form"))),
    ("strip_accents", classOf[StripAccents],
      (c: Seq[Expression]) => StripAccents(c(0))),
    ("theta_sketch_agg", classOf[ThetaSketchAgg],
      (c: Seq[Expression]) => ThetaSketchAgg(c.head,
        if (c.length > 1) intLiteral(c(1), "lgK") else 12).toAggregateExpression()),
    ("theta_estimate", classOf[ThetaEstimate],
      (c: Seq[Expression]) => ThetaEstimate(c.head)),
    ("theta_intersect_estimate", classOf[ThetaIntersectEstimate],
      (c: Seq[Expression]) => ThetaIntersectEstimate(c(0), c(1))),
    ("kll_quantile_agg", classOf[KllSketchAgg],
      (c: Seq[Expression]) => KllSketchAgg(c.head,
        if (c.length > 1) intLiteral(c(1), "k") else 200).toAggregateExpression()),
    ("kll_merge_agg", classOf[KllMergeAgg],
      (c: Seq[Expression]) => KllMergeAgg(c.head,
        if (c.length > 1) intLiteral(c(1), "k") else 200).toAggregateExpression()),
    ("kll_quantile", classOf[KllQuantile],
      (c: Seq[Expression]) => KllQuantile(c(0), c(1))),
    ("cov_accum_agg", classOf[CovAccumAgg],
      (c: Seq[Expression]) => CovAccumAgg(c(0),
        intLiteral(c(1), "d")).toAggregateExpression()),
    ("cms_agg", classOf[CmsAgg],
      (c: Seq[Expression]) => CmsAgg(c.head,
        if (c.length > 1) intLiteral(c(1), "depth") else 6,
        if (c.length > 2) intLiteral(c(2), "width") else 16384).toAggregateExpression()),
    ("cms_merge_agg", classOf[CmsMergeAgg],
      (c: Seq[Expression]) => CmsMergeAgg(c.head).toAggregateExpression()),
    ("cms_estimate", classOf[CmsEstimate],
      (c: Seq[Expression]) => CmsEstimate(c(0), c(1))),
    ("cms_total", classOf[CmsTotal],
      (c: Seq[Expression]) => CmsTotal(c.head)),
    // Spark's own runtime-filter expressions, surfaced under graft names
    // (Spark registers no public SQL name for them): the STORED-membership
    // pattern — build once, persist, probe later with zero join
    ("seen_filter_agg",
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate],
      (c: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          c(0), c(1), c(2)).toAggregateExpression()),
    ("seen_might_contain",
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain],
      (c: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(c(0), c(1))))
}

/** Runtime registration of the engine's native expressions, for sessions
  * not built with [[graft.GraftExtensions]] (e.g. an already-running
  * notebook session). Idempotent; operators call it before using the
  * functions by name.
  */
object GraftFunctions {
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    FunctionBuilders.all.foreach { case (name, clazz, builder) =>
      val id = new FunctionIdentifier(name)
      if (!registry.functionExists(id)) {
        registry.registerFunction(id,
          new ExpressionInfo(clazz.getName, name),
          (children: Seq[Expression]) => builder(children))
      }
    }
  }
}
