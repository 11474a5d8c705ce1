package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Static kernels for the vector expressions — tight JVM loops reachable
  * from generated code (same pattern as [[SimHashUtil]]).
  */
object VectorUtil {

  private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Cosine similarity in double precision, single sequential pass (the
    * accumulation order is fixed, so results are reproducible run-to-run
    * and engine-to-engine). Length mismatch → NaN (caller filters). */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return Double.NaN
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, aFloat); val y = elem(b, i, bFloat)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) Double.NaN
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Rademacher sign matrix for [[lshSketch]], memoized per executor:
    * the signs are a pure function of (numTables, numBits, dim) — the
    * same hyperplanes for every vector — so hashing them per ROW
    * multiplied the sketch cost by the corpus size for no reason
    * (numTables·numBits·dim XXH64 calls per vector). One flat ±1 array
    * per geometry, a few KB, computed once per JVM. Values are
    * IDENTICAL to the previous per-row derivation (same
    * xxhash64(dim, seed=table·numBits+bit+1) bit), so sketches — and
    * every LSH bucket ever persisted — are unchanged. */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private def signs(numTables: Int, numBits: Int, dim: Int): Array[Double] =
    signCache.computeIfAbsent((numTables, numBits, dim), { key =>
      val (nt, nb, d0) = key
      val a = new Array[Double](nt * nb * d0)
      var t = 0
      while (t < nt) {
        var j = 0
        while (j < nb) {
          val seed = (t * nb + j + 1).toLong
          var d = 0
          while (d < d0) {
            a((t * nb + j) * d0 + d) =
              if ((XXH64.hashLong(d.toLong, seed) & 1L) == 1L) 1.0 else -1.0
            d += 1
          }
          j += 1
        }
        t += 1
      }
      a
    })

  /** Sign-random-projection LSH sketch: `numTables` buckets, each from
    * `numBits` hyperplanes with Rademacher (±1) components derived from
    * xxhash64(dim, seed=table*numBits+bit) — deterministic, no stored
    * model. Vectors within a small angle agree on all bits of some table
    * with high probability. */
  def lshSketch(v: ArrayData, isFloat: Boolean, numTables: Int, numBits: Int): ArrayData = {
    val dim = v.numElements()
    val sgn = signs(numTables, numBits, dim)
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var j = 0
      while (j < numBits) {
        val base = (t * numBits + j) * dim
        var dot = 0.0
        var d = 0
        while (d < dim) {
          dot += elem(v, d, isFloat) * sgn(base + d)
          d += 1
        }
        if (dot > 0.0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** PQ encode: per subspace, the index of the nearest centroid by
    * squared L2 over the vector's slice — the write-side twin of
    * [[pqAdc]]. Matches the declarative HOF form bit-for-bit: distances
    * accumulate in ascending dim order, argmin keeps the FIRST minimum
    * (`array_position(ds, array_min(ds))` semantics). A vector shorter
    * than m·subDim returns null (malformed record; caller quarantines).
    * Runs once per corpus row at index-build time — the
    * expression-is-the-workload case that justifies a native kernel. */
  def pqEncode(v: ArrayData, cb: ArrayData, isFloat: Boolean): ArrayData = {
    val m = cb.numElements()
    if (m == 0) return null
    val out = new Array[Int](m)
    var s = 0
    var offset = 0
    while (s < m) {
      val centroids = cb.getArray(s)
      val k = centroids.numElements()
      if (k == 0) return null
      val subDim = centroids.getArray(0).numElements()
      if (offset + subDim > v.numElements()) return null
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val cent = centroids.getArray(c)
        if (cent.numElements() != subDim) return null
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val t = elem(v, offset + i, isFloat) - cent.getDouble(i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      offset += subDim
      s += 1
    }
    new GenericArrayData(out)
  }

  /** PQ asymmetric-distance score: Σ_s lut(s)(codes(s)). The inner hot
    * loop of a PQ scan — m lookups + adds per (vector, query). Any
    * malformed record (subspace-count mismatch, code outside the lut)
    * answers NaN so the rank tail drops it instead of crashing the scan. */
  def pqAdc(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    if (lut.numElements() != m) return Double.NaN
    var acc = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      val t = lut.getArray(s)
      if (c < 0 || c >= t.numElements()) return Double.NaN
      acc += t.getDouble(c)
      s += 1
    }
    acc
  }
}

/** `cosine_similarity(array<float|double>, array<float|double>) -> double`
  * — native codegen'd expression. The HOF composition
  * (`aggregate(zip_with(...))`) allocates a lambda frame per element and
  * stays interpreted; on a 100 TB scan of embeddings this expression IS
  * the workload, so it gets the tight loop. (SURVEY.md §7.3.)
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity requires array<float|double>, got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left), isFloatArr(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorUtil.cosine($a, $b, ${isFloatArr(left)}, ${isFloatArr(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** `cosine_lsh_sketch(vec, numTables, numBits) -> array<bigint>` — one
  * LSH bucket id per table. numTables/numBits must be integer literals.
  */
case class CosineLshSketch(child: Expression, numTables: Int, numBits: Int)
    extends UnaryExpression {

  private def isFloatArr: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if numTables > 0 && numBits > 0 && numBits <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure("numTables must be > 0 and 0 < numBits <= 63")
    case other => TypeCheckResult.TypeCheckFailure(
      s"cosine_lsh_sketch requires array<float|double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cosine_lsh_sketch"

  override protected def nullSafeEval(input: Any): Any =
    VectorUtil.lshSketch(input.asInstanceOf[ArrayData], isFloatArr, numTables, numBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorUtil.lshSketch($c, $isFloatArr, $numTables, $numBits)")

  override protected def withNewChildInternal(newChild: Expression): CosineLshSketch =
    copy(child = newChild)
}

/** `pq_encode(vec array<float|double>, codebooks array<array<array<double>>>)
  * -> array<int>` — nearest-centroid codes per subspace, the PQ
  * index-build kernel as a native codegen'd expression. The HOF form
  * (nested `transform` + `aggregate∘zip_with` + `array_position` over a
  * re-computed distance list) allocates lambda frames per (subspace,
  * centroid, dim) and runs interpreted; encoding executes once per
  * corpus row. Null-out (not crash) on malformed vectors. */
case class PqEncode(left: Expression, right: Expression) extends BinaryExpression {

  private def isFloatArr: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires (array<float|double>, array<array<array<double>>>), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.pqEncode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloatArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = isFloatArr
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = graft.functions.VectorUtil.pqEncode($a, $b, $f);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
    copy(left = l, right = r)
}

/** `pq_adc(codes array<int>, lut array<array<double>>) -> double` — the
  * PQ asymmetric-distance scan kernel as a native codegen'd expression.
  * The HOF composition (`aggregate(zip_with(codes, lut, (c, t) -> t[c]),
  * …)`) allocates lambda frames per subspace and runs interpreted; a PQ
  * scan executes this once per (vector, query) over the WHOLE corpus —
  * exactly the expression-is-the-workload case `cosine_similarity` made
  * native (SURVEY.md §7.3). */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (array<int>, array<array<double>>), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.pqAdc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtil.pqAdc($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}
