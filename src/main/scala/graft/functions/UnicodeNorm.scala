package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for Unicode text canonicalization — the step a text
  * pipeline runs BEFORE tokenizing, hashing, or deduplicating: the same
  * visible text can arrive as precomposed (`é`) or decomposed (`e`+◌́)
  * code points, and every downstream equality — exact dedup keys, shingle
  * hashes, contamination n-grams — silently misses unless the bytes are
  * canonicalized first. Backed by the JDK's `java.text.Normalizer`
  * (Unicode UAX #15, public spec); the oracle row cross-checks it
  * against DuckDB's utf8proc-backed `nfc_normalize`/`strip_accents` —
  * two independent implementations of the same published algorithm.
  */
object UnicodeNormUtil {
  /** Indexed once; ordinals are stable JDK constants (NFC/NFD/NFKC/NFKD). */
  private val forms: Array[Normalizer.Form] = Normalizer.Form.values()

  def formOrdinal(name: String): Int = {
    val i = forms.indexWhere(_.name == name)
    require(i >= 0, s"unicode_norm: unknown form '$name' — " +
      s"one of ${forms.map(_.name).mkString(", ")}")
    i
  }

  def normalize(s: UTF8String, formOrdinal: Int): UTF8String = {
    val str = s.toString
    val f = forms(formOrdinal)
    // quick-check fast path: ASCII (and most real text) is already
    // normalized in every form — no second allocation on the hot path
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  /** NFD then drop nonspacing marks (category Mn) — the utf8proc
    * `strip_accents` recipe: é→e, ñ→n, Å→A, while non-decomposable
    * letters (ø, ß) and compatibility ligatures (ﬁ) pass through. */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s
    val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
    val out = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) out.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(out.toString)
  }
}

/** `unicode_norm(string, 'NFC'|'NFD'|'NFKC'|'NFKD') -> string` — native
  * Catalyst expression with whole-stage codegen (the canonicalization
  * pass runs over every byte of a 100 TB corpus; a Scala UDF would box
  * each row and break the codegen span). The form is a required string
  * LITERAL, resolved to an ordinal at plan time — per-row work is one
  * quick-check plus (rarely) one normalize. */
case class UnicodeNorm(child: Expression, form: String) extends UnaryExpression {
  private val ordinal = UnicodeNormUtil.formOrdinal(form)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_norm requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_norm"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormUtil.normalize(input.asInstanceOf[UTF8String], ordinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeNormUtil.normalize($c, $ordinal)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNorm =
    copy(child = newChild)
}

/** `strip_accents(string) -> string` — see [[UnicodeNormUtil.stripAccents]]. */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"strip_accents requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormUtil.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormUtil.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
