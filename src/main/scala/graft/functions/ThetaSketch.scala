package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for the theta-sketch expressions (JVM-static-reachable
  * for `doGenCode`, same pattern as [[SimHashUtil]]). Theta sketches are
  * the DataSketches family that supports SET OPERATIONS — HLL (qk_hll_*)
  * can only union, so "how many distinct tokens/users do corpus A and
  * corpus B SHARE?" needs theta. The sketch is a k-minimum-hash sample:
  * deterministic for a given input SET (order- and duplicate-
  * insensitive), EXACT below k entries, and mergeable/intersectable in
  * kilobytes — the right summary to persist next to each corpus
  * partition at 100 TB. (Jars ship with Spark: datasketches-java is on
  * /opt/spark/jars for Spark's own hll_* functions.)
  */
object ThetaUtil {
  def estimate(bytes: Array[Byte]): Double =
    wrap(bytes).getEstimate

  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val op = SetOperation.builder().buildIntersection()
    op.intersect(wrap(a))
    op.intersect(wrap(b))
    op.getResult.getEstimate
  }

  private[graft] def wrap(bytes: Array[Byte]): Sketch =
    Sketches.wrapSketch(Memory.wrap(bytes))
}

/** `theta_sketch_agg(value[, lgK]) -> binary`: distinct-set summary as a
  * [[TypedImperativeAggregate]] over a DataSketches theta Union buffer.
  * Rides normal partial/final aggregation — each map task keeps one
  * ≤2^lgK-entry sketch per group and ships kilobytes, never rows.
  * Output is the compact sketch binary: store it, re-merge it later with
  * this same aggregate's merge path, or feed it to `theta_estimate` /
  * `theta_intersect_estimate`.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"theta_sketch_agg lgK out of range: $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg requires string/bigint/int, got ${other.catalogString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(u: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => u.update(s.toString)
      case l: java.lang.Long => u.update(l.longValue())
      case i: java.lang.Integer => u.update(i.longValue())
      case other => throw new IllegalStateException(s"unreachable input: $other")
    }
    u
  }

  override def merge(u: Union, other: Union): Union = {
    u.union(other.getResult)
    u
  }

  override def eval(u: Union): Any = u.getResult.toByteArray

  override def serialize(u: Union): Array[Byte] = u.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(ThetaUtil.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `theta_estimate(binary) -> double`: distinct-count estimate of a
  * stored theta sketch. Codegen'd via the static kernel — though these
  * run on post-aggregation rows (one per group), so the span matters
  * less than for scan-side expressions. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override protected def nullSafeEval(input: Any): Any =
    ThetaUtil.estimate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ThetaUtil.estimate($c)")

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** `theta_intersect_estimate(binary, binary) -> double`: estimated size
  * of the INTERSECTION of two stored theta sketches — the distinct-
  * overlap question (shared users, shared tokens, contamination overlap)
  * that union-only summaries cannot answer. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"theta_intersect_estimate requires (binary, binary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_intersect_estimate"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaUtil.intersectEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ThetaUtil.intersectEstimate($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}
