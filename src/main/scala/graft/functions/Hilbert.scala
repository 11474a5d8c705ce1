package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve position kernel. Static object so generated code can
  * call it directly (same pattern as [[ZOrderUtil]]).
  *
  * The classic iterative quadrant-rotation mapping: at each scale the
  * quadrant index contributes two bits to the distance and the frame is
  * rotated/reflected so the curve's entry/exit corners line up, which
  * is exactly what gives Hilbert its defining property over Morton:
  * CONSECUTIVE curve positions are always UNIT NEIGHBORS in (x, y) —
  * the curve never teleports across the plane the way a Z-curve does at
  * quadrant seams. HilbertSpec proves both properties from first
  * principles (exhaustive bijection on small grids, unit-step adjacency
  * up to the full 62-bit range), so no external table or constant is
  * trusted. */
object HilbertUtil {

  /** Curve distance of (x, y) on the 2^order × 2^order grid. Both
    * coordinates must already lie in [0, 2^order). */
  def xy2dN(order: Int, xIn: Long, yIn: Long): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the lower quadrant into canonical orientation
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      x &= s - 1
      y &= s - 1
      s >>= 1
    }
    d
  }

  /** Inverse of [[xy2dN]]: (x, y) of curve distance `d`. */
  def d2xyN(order: Int, dIn: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = dIn
    var s = 1L
    while (s < (1L << order)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** Production kernel: distance on the fixed 2^31 grid (the same
    * 31-bit coordinate domain [[ZOrderUtil.interleave]] masks to), as a
    * NON-NEGATIVE 62-bit long, so signed ordering == curve ordering.
    * Callers pre-normalize wider domains exactly as for `zorder_key`. */
  def position(a: Long, b: Long): Long =
    xy2dN(31, a & 0x7FFFFFFFL, b & 0x7FFFFFFFL)
}

/** `hilbert_key(a bigint, b bigint) -> bigint` — the Hilbert-curve
  * position of (a, b), for range-clustering data on TWO dimensions with
  * strictly better locality than `zorder_key`.
  *
  * Both curves make an AND-of-ranges box read prune on either axis; the
  * difference is at cell seams. A Z-curve jumps across half the plane
  * every time the interleaved prefix rolls over, so files cut from
  * consecutive curve ranges can span disjoint plane regions PLUS the
  * jump — their min/max boxes widen and pruning weakens. The Hilbert
  * curve's unit-step adjacency means every file covers one CONNECTED
  * plane region, the tightest min/max boxes a linear order can give —
  * which is why public lakehouse clustering implementations moved from
  * Morton to Hilbert. ~31 rotate/mask steps per row at cluster-write
  * time only; reads just use the recorded file stats. */
case class HilbertKey(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_key requires (bigint, bigint), got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertUtil.position(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HilbertUtil.position($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}
