package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-curve) interleaving kernel. Static object so generated code
  * can call it directly (same pattern as [[SimHashUtil]]). */
object ZOrderUtil {
  /** Spread the low 32 bits of v to the even bit positions of a long. */
  def spread(vIn: Long): Long = {
    var v = vIn & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Interleave the low 31 bits of a and b (a on even positions):
    * z-curve position as a NON-NEGATIVE long, so signed ordering ==
    * curve ordering. Inputs are masked to 31 bits — callers must
    * pre-normalize wider domains (ranks, epoch seconds, bucketed
    * doubles) or locality silently degrades to the masked low bits. */
  def interleave(a: Long, b: Long): Long =
    spread(a & 0x7FFFFFFFL) | (spread(b & 0x7FFFFFFFL) << 1)
}

/** `zorder_key(a bigint, b bigint) -> bigint` — the Z-curve position of
  * (a, b), for range-clustering data on TWO dimensions at once.
  *
  * Files clustered on a lexicographic (a, b) sort prune perfectly on
  * `a` but not at all on `b` alone; files clustered on the Z-curve key
  * keep BOTH dimensions locally contiguous, so either dimension's
  * predicate skips most files via parquet min/max stats (each file
  * covers ~√F of each axis instead of all of one and 1/F of the other).
  * Codegen'd (five shift-mask steps per side — scan-speed), registered
  * via [[graft.GraftExtensions]].
  */
case class ZOrderKey(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder_key requires (bigint, bigint), got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderUtil.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrderUtil.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}
