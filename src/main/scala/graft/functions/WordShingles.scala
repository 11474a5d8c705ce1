package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object WordShinglesUtil {
  private val Space = UTF8String.fromString(" ")

  /** All n-token shingles of a single-space-tokenized text, one split,
    * one pass. Tokenization matches `split(text, ' ')` exactly (empty
    * tokens between consecutive spaces included). Texts shorter than n
    * tokens yield one whole-text shingle. */
  def shingles(text: UTF8String, n: Int): GenericArrayData = {
    val toks = text.split(Space, -1)
    val count = math.max(toks.length - n + 1, 1)
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, toks.length)
      out(i) = UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(toks, i, end): _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `word_shingles(text, n) -> array<string>` — native codegen'd shingle
  * generator.
  *
  * The built-in composition
  * `transform(sequence(1, size(split(text)) - n + 1), i -> concat_ws(' ', slice(split(text), i, n)))`
  * is quadratic in practice: higher-order functions run interpreted, and
  * CollapseProject inlines the `split` into the lambda, so the text is
  * re-split once per shingle (measured: 93 s for one sf0.1 pass vs ~2 s
  * with this expression). Shingling sits on the scan side of every
  * dedup/fingerprint pipeline, so it earns a tight loop.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure("n must be > 0")
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesUtil.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShinglesUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
