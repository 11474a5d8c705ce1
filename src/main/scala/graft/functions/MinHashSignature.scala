package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object MinHashSignatureUtil {
  private val Space = UTF8String.fromString(" ")

  /** k-element MinHash signature of a text's n-token shingles, in one
    * pass: tokenize once, slide the shingle window, derive k seeded
    * hashes per shingle, keep per-seed minima. Bit-equal to
    * min(xxhash64(shingle, i)) per i — Spark's multi-arg xxhash64 chains
    * `hashLong(i, hashBytes(shingle, 42))`, replicated here, so the
    * aggregator-based reference path produces the same signature
    * (asserted by DedupSpec). Duplicate shingles can't change a min, so
    * distinctness is free.
    */
  def signature(text: UTF8String, n: Int, k: Int): GenericArrayData = {
    val toks = text.split(Space, -1)
    val count = math.max(toks.length - n + 1, 1)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, toks.length)
      val shingle = UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(toks, i, end): _*)
      val inner = XXH64.hashUnsafeBytes(shingle.getBaseObject, shingle.getBaseOffset,
        shingle.numBytes, 42L)
      var j = 0
      while (j < k) {
        val h = XXH64.hashLong(j.toLong, inner)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** `minhash_signature(text, n, k) -> array<bigint>` — whole-signature
  * MinHash in a native codegen'd loop. The relational formulation
  * (explode shingles → k hashes each → element-wise-min aggregate)
  * shuffles every (shingle × seed) hash; this computes the signature at
  * the scan and ships k longs per doc. [[graft.functions.ElementwiseMin]]
  * remains the aggregator-based reference implementation — DedupSpec
  * asserts both paths produce identical signatures.
  */
case class MinHashSignature(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 && k > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure("n and k must be > 0")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignatureUtil.signature(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSignatureUtil.signature($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
