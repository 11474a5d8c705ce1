package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The prepared tokenizer vocabulary: merge pairs keyed to their
  * training rank. Built ONCE per expression instance (driver side) and
  * shipped to executors inside the serialized expression — the
  * PQ-codebook pattern ([[PqAdc]]) applied to the lexical tokenizer. */
final class BpeVocab(val pairsL: Array[String], val pairsR: Array[String])
  extends Serializable {
  require(pairsL.length == pairsR.length, "merge table halves differ")
  // the rank map joins pair halves with NUL; a symbol carrying NUL could
  // alias across the separator (("aNULb","c") vs ("a","bNULc")),
  // so reject it at construction — the writeCommit idiom. Corpus TEXT
  // with NUL is still fine: every vocab key then has exactly one NUL,
  // never at position 0, so a corpus-pair lookup can only miss, not alias.
  locally {
    var i = 0
    while (i < pairsL.length) {
      require(pairsL(i).indexOf('\u0000') < 0 && pairsR(i).indexOf('\u0000') < 0,
        s"bpe vocab: merge symbol at rank $i contains NUL, which the rank-map " +
          "key format cannot carry")
      i += 1
    }
  }
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pairsL.length * 2)
    var i = 0
    while (i < pairsL.length) {
      // first-learned rank wins if a pair somehow repeats
      m.putIfAbsent(pairsL(i) + "\u0000" + pairsR(i), Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** Standard BPE encode (Sennrich 2016 reference semantics): split to
    * characters, then repeatedly merge the adjacent pair with the
    * LOWEST training rank, leftmost first on ties. Provably equivalent
    * to applying every merge in training order (a merge can never
    * create a pair of LOWER rank — that pair's symbol did not exist
    * when the earlier merge was learned), but costs O(len²) per token
    * independent of vocabulary depth instead of O(merges·len) —
    * the shape a ~30k-merge production vocabulary needs.
    * BpeSpec pins the equivalence against the in-order
    * nested-replace form on real corpora. */
  def encode(token: UTF8String): GenericArrayData = {
    val s = token.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    var syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(s.substring(i, i + n))
      i += n
    }
    var done = false
    while (!done && syms.size > 1) {
      // find the lowest-rank adjacent pair
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = rank.get(syms.get(j) + "\u0000" + syms.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        // merge EVERY occurrence of that pair left-to-right,
        // non-overlapping — one training merge applied everywhere,
        // exactly the in-order replace semantics
        val l = pairsL(bestRank); val r = pairsR(bestRank)
        val out = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == l && syms.get(k + 1) == r) {
            out.add(l + r); k += 2
          } else { out.add(syms.get(k)); k += 1 }
        }
        syms = out
      }
    }
    val arr = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) { arr(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    new GenericArrayData(arr)
  }
}

/** `bpe_apply` — production BPE ENCODE as a native expression with the
  * learned vocabulary baked in: `token → array<string>` of subwords.
  * The merge table (any depth — [[graft.operators.Bpe.learnMergesDelta]]
  * trains past the nested-replace form's practical limit) ships once
  * inside the expression; the corpus streams through scan-side with no
  * join and no per-row vocabulary lookup cost beyond the in-memory
  * rank map. Registered as `bpe_apply(token, p1s, p2s)` with the merge
  * halves as array<string> LITERALS (the builder bakes them into a
  * [[BpeVocab]] at resolution); [[graft.operators.Bpe.encodeWith]] is
  * the typed entry point. */
case class BpeApply(child: Expression, vocab: BpeVocab) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  override protected def nullSafeEval(input: Any): Any =
    vocab.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
}
