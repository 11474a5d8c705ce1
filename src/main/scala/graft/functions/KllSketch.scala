package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Static kernel for the KLL quantile-sketch expressions — the fourth
  * leg of the persisted-summary family ([[graft.operators.Sketches]]):
  * distinct = HLL, set ops = theta, membership = bloom, QUANTILES = KLL.
  * `approx_percentile` (q24/q35) answers one query over one scan; a
  * PERSISTED KLL blob is built once per partition and any later
  * quantile — any rank, any rollup slice — is read from kilobytes.
  * Rank-error bound at the default k=200: ±1.65% of rank with 99%
  * confidence, mergeable without bound degradation (the DataSketches
  * KLL guarantee; SketchesSpec pins it empirically). */
object KllUtil {
  /** NaN for an empty sketch (a group whose values were all null) and
    * for an out-of-range rank — DataSketches throws in both cases, and a
    * crash is the wrong answer for one bad row in a million-group
    * rollup; NaN is diagnosable per-row. */
  def quantile(bytes: Array[Byte], rank: Double): Double = {
    if (rank.isNaN || rank < 0.0 || rank > 1.0) return Double.NaN
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) Double.NaN
    else sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)
  }
}

/** `kll_quantile_agg(value double[, k]) -> binary`: per-group KLL
  * quantile sketch as a [[TypedImperativeAggregate]]. Map tasks keep one
  * ~3 KB sketch per group and ship that, never rows. */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"kll_quantile_agg k out of range: $k")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_quantile_agg requires double, got ${other.catalogString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_quantile_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(s: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) s.update(v.asInstanceOf[Double])
    s
  }

  override def merge(s: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    s.merge(other)
    s
  }

  override def eval(s: KllDoublesSketch): Any = s.toByteArray
  override def serialize(s: KllDoublesSketch): Array[Byte] = s.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `kll_merge_agg(binary) -> binary`: merge STORED KLL sketches — the
  * re-aggregation path over persisted partials (the `hll_union_agg`
  * analogue for quantiles). Mergeability is the whole point of
  * persisting sketches: rollups never revisit raw rows.
  *
  * The accumulator ADOPTS the k of the first stored sketch it absorbs:
  * a still-empty default-k buffer merging partials built with a larger
  * k would silently clamp the rollup's rank accuracy down to k=200
  * (KLL merge degrades to the smaller k). Mixed-k INPUTS still degrade
  * to the smallest input k — that is the KLL contract itself, not a
  * buffer artifact. */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg requires binary, got ${other.catalogString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  /** Merge `in` into `s`, re-homing an empty low-k buffer onto `in`'s k
    * first so the buffer never caps the inputs' precision. */
  private def absorb(s: KllDoublesSketch, in: KllDoublesSketch): KllDoublesSketch = {
    val acc = if (s.isEmpty && in.getK > s.getK)
      KllDoublesSketch.newHeapInstance(in.getK) else s
    acc.merge(in)
    acc
  }

  override def update(s: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v == null) s
    else absorb(s, KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
  }

  override def merge(s: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch =
    absorb(s, other)

  override def eval(s: KllDoublesSketch): Any = s.toByteArray
  override def serialize(s: KllDoublesSketch): Array[Byte] = s.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `kll_quantile(binary, rank double) -> double`: read any quantile out
  * of a stored KLL sketch (INCLUSIVE search criteria — the value whose
  * rank is ≥ the requested rank). */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile requires (binary, double), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    KllUtil.quantile(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.KllUtil.quantile($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}
