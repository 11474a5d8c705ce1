package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object BpeExpandUtil {
  // Line terminators Java's regex `.` skips without DOTALL — the exact
  // set regexp_replace(s, "(.)", "$1  ") leaves unexpanded. Preserving
  // them keeps this expression bit-identical to the regex form it
  // replaces (FunctionsSpec pins the equality on the real corpus).
  private def isLineTerminator(cp: Int): Boolean =
    cp == '\n' || cp == '\r' || cp == 0x85 || cp == 0x2028 || cp == 0x2029

  /** Codepoint of the UTF-8 char at `i` (valid lead byte assumed; only
    * called on un-clamped sequences — a truncated multi-byte lead is
    * handled by the caller without decoding, because decoding clamped
    * bytes could accidentally produce a terminator codepoint). */
  private def codePointAt(in: Array[Byte], i: Int, len: Int): Int = len match {
    case 1 => in(i) & 0xFF
    case 2 => ((in(i) & 0x1F) << 6) | (in(i + 1) & 0x3F)
    case 3 => ((in(i) & 0x0F) << 12) | ((in(i + 1) & 0x3F) << 6) | (in(i + 2) & 0x3F)
    case _ => ((in(i) & 0x07) << 18) | ((in(i + 1) & 0x3F) << 12) |
      ((in(i + 2) & 0x3F) << 6) | (in(i + 3) & 0x3F)
  }

  /** `"low"` → `"l  o  w  "`: two spaces after every codepoint except
    * line terminators — one bounds-checked byte loop instead of a regex
    * engine pass per token. */
  def expand(s: UTF8String): UTF8String = {
    val in = s.getBytes
    if (in.length == 0) return UTF8String.EMPTY_UTF8
    // worst case: every char is 1 byte and gains 2 spaces
    val out = new Array[Byte](in.length * 3)
    var i = 0
    var o = 0
    while (i < in.length) {
      var len = UTF8String.numBytesForFirstByte(in(i))
      val clamped = i + len > in.length
      if (clamped) len = in.length - i // malformed tail: copy as-is
      System.arraycopy(in, i, out, o, len)
      o += len
      // a clamped (malformed) sequence is NEVER a terminator: the String
      // conversion the regex form sees turns it into U+FFFD, which `.`
      // matches — decoding the truncated bytes here could alias a
      // terminator codepoint (e.g. 0xE0 with one tail byte of ..0x0A)
      // and silently diverge from the regexp_replace oracle
      if (clamped || !isLineTerminator(codePointAt(in, i, len))) {
        out(o) = ' '; out(o + 1) = ' '
        o += 2
      }
      i += len
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }
}

/** `bpe_expand(s) -> string` — native codegen'd per-character doubled-space
  * expansion, the scan-side hot loop of BPE training AND encoding
  * ([[graft.operators.Bpe]]): every token of the corpus becomes its
  * doubled-space symbol form (`"low"` → `"  l  o  w  "` after the caller's
  * leading-pad concat).
  *
  * Replaces `regexp_replace(w, "(.)", "$1  ")`, which compiles to a Java
  * regex engine pass per token — measured the dominant per-byte cost of
  * `qt_bpe_encode` under driver-pack pressure (BENCH_r09: 13.5 s vs a
  * 2.5 s quiet floor). Semantics are IDENTICAL to the regex form
  * including the `.`-skips-line-terminators rule, so the DuckDB oracle
  * (which keeps its own regexp form) still hash-matches — the
  * cross-engine equivalence is the correctness evidence.
  */
case class BpeExpand(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_expand requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_expand"

  override protected def nullSafeEval(input: Any): Any =
    BpeExpandUtil.expand(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeExpandUtil.expand($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeExpand =
    copy(child = newChild)
}
