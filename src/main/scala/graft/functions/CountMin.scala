package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the FREQUENCY leg of
  * the persisted-summary family ([[graft.operators.Sketches]]): distinct =
  * HLL, set ops = theta, membership = bloom, quantiles = KLL, per-key
  * COUNTS = CMS. DataSketches ships a frequent-items (Misra–Gries) sketch
  * — the streaming heavy-hitters state — but that answers only "which keys
  * are heavy"; a CMS answers "how often did THIS key occur" for ANY key
  * after the fact, from a fixed `depth×width` counter matrix that merges
  * by elementwise ADDITION. Merging per-partition partials is therefore
  * BIT-IDENTICAL to sketching the whole input in one pass (counts
  * commute), the same exactness-of-merge claim the HLL/KLL legs pin.
  *
  * Guarantees (for point queries over `total` updates):
  *   - one-sided: estimate ≥ true count, ALWAYS (hash collisions only add);
  *   - bounded: P[estimate > true + (e/width)·total] ≤ exp(−depth), per
  *     query, from Markov on each row's collision mass + row independence.
  *
  * Hashing is DETERMINISTIC and engine-independent: the caller supplies an
  * already-hashed 64-bit key (`xxhash64(col)` — the engine's stock hash),
  * and row `i` derives its bucket via a splitmix64 finalizer over
  * `key ⊕ seed_i` with fixed odd seeds — the standard practical stand-in
  * for a pairwise-independent family (the certification row measures the
  * realized bound rather than assuming the idealized one). Same input set
  * ⇒ same bytes, regardless of row order, partitioning, or file layout.
  */
object CmsUtil {

  /** Fixed per-row seed schedule: golden-ratio increments (splitmix64's
    * own stream constant), so depths up to 64 get distinct streams. */
  private val GoldenGamma = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer: full-avalanche 64→64 mix. */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Bucket of `key` in row `row` of a width-`width` matrix. */
  def bucket(key: Long, row: Int, width: Int): Int =
    ((mix(key + (row + 1) * GoldenGamma) & Long.MaxValue) % width).toInt

  /** Mutable heap sketch. `depth == 0` is the UNINITIALIZED sentinel a
    * merge buffer starts from — it adopts the dims of the first real
    * sketch it absorbs (the [[KllMergeAgg]] discipline, so an empty
    * default buffer can never clamp stored partials to other dims). */
  final class Sketch(val depth: Int, val width: Int) {
    require(depth >= 0 && depth <= 64, s"cms depth out of range: $depth")
    require(width >= 0 && width <= (1 << 24), s"cms width out of range: $width")
    val counts = new Array[Long](depth * width)
    var total: Long = 0L

    def update(key: Long, inc: Long): Unit = {
      var r = 0
      while (r < depth) {
        counts(r * width + bucket(key, r, width)) += inc
        r += 1
      }
      total += inc
    }

    def estimate(key: Long): Long = {
      if (depth == 0) return 0L
      var min = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = counts(r * width + bucket(key, r, width))
        if (c < min) min = c
        r += 1
      }
      min
    }

    /** Elementwise sum; dims must match (the `require` is the loud
      * alternative to silently min-ing precision — unlike KLL, CMS
      * matrices of different shapes share no common refinement). */
    def mergeIn(o: Sketch): Unit = {
      require(depth == o.depth && width == o.width,
        s"cms merge of mismatched dims: ${depth}x$width vs ${o.depth}x${o.width}")
      var i = 0
      while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
      total += o.total
    }

    def serialize: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 4 + 8 + counts.length * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(depth).putInt(width).putLong(total)
      var i = 0
      while (i < counts.length) { bb.putLong(counts(i)); i += 1 }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): Sketch = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val depth = bb.getInt; val width = bb.getInt
    val s = new Sketch(depth, width)
    s.total = bb.getLong
    var i = 0
    while (i < s.counts.length) { s.counts(i) = bb.getLong; i += 1 }
    s
  }

  /** Point-query a STORED sketch. Kept `(bytes, key)`-shaped for the
    * codegen call sites below. */
  def estimate(bytes: Array[Byte], key: Long): Long = deserialize(bytes).estimate(key)

  /** Total updates a stored sketch absorbed — the `N` in the ε·N bound,
    * read back so certification needs no second scan. */
  def total(bytes: Array[Byte]): Long = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.getInt; bb.getInt
    bb.getLong
  }
}

/** `cms_agg(keyHash long[, depth[, width]]) -> binary`: per-group count-min
  * sketch over pre-hashed keys, one update per row. Defaults 6×16384 —
  * 768 KB of counters, ε = e/16384 ≈ 1.7e-4 of total mass, per-query
  * overshoot probability e⁻⁶ ≈ 0.25%. */
case class CmsAgg(
    child: Expression,
    depth: Int = 6,
    width: Int = 16384,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsUtil.Sketch] {

  require(depth >= 1 && depth <= 64, s"cms_agg depth out of range: $depth")
  require(width >= 16 && width <= (1 << 24), s"cms_agg width out of range: $width")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_agg requires a long key hash, got ${other.catalogString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_agg"

  override def createAggregationBuffer(): CmsUtil.Sketch =
    new CmsUtil.Sketch(depth, width)

  override def update(s: CmsUtil.Sketch, input: InternalRow): CmsUtil.Sketch = {
    val v = child.eval(input)
    if (v != null) s.update(v.asInstanceOf[Long], 1L)
    s
  }

  override def merge(s: CmsUtil.Sketch, other: CmsUtil.Sketch): CmsUtil.Sketch = {
    s.mergeIn(other)
    s
  }

  override def eval(s: CmsUtil.Sketch): Any = s.serialize
  override def serialize(s: CmsUtil.Sketch): Array[Byte] = s.serialize
  override def deserialize(bytes: Array[Byte]): CmsUtil.Sketch =
    CmsUtil.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `cms_merge_agg(binary) -> binary`: merge STORED CMS partials — the
  * re-aggregation path. The buffer starts as the depth-0 sentinel and
  * adopts the first input's dims; mismatched stored dims fail loudly. */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsUtil.Sketch] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_merge_agg requires binary, got ${other.catalogString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_merge_agg"

  override def createAggregationBuffer(): CmsUtil.Sketch =
    new CmsUtil.Sketch(0, 0)

  private def absorb(s: CmsUtil.Sketch, in: CmsUtil.Sketch): CmsUtil.Sketch =
    if (in.depth == 0) s
    else if (s.depth == 0) in
    else { s.mergeIn(in); s }

  override def update(s: CmsUtil.Sketch, input: InternalRow): CmsUtil.Sketch = {
    val v = child.eval(input)
    if (v == null) s
    else absorb(s, CmsUtil.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(s: CmsUtil.Sketch, other: CmsUtil.Sketch): CmsUtil.Sketch =
    absorb(s, other)

  override def eval(s: CmsUtil.Sketch): Any = s.serialize
  override def serialize(s: CmsUtil.Sketch): Array[Byte] = s.serialize
  override def deserialize(bytes: Array[Byte]): CmsUtil.Sketch =
    CmsUtil.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `cms_estimate(binary, keyHash long) -> long`: point-query a stored
  * sketch (≥ true count always; ≤ true + ε·total w.h.p.). */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires (binary, long), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CmsUtil.estimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CmsUtil.estimate($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

/** `cms_total(binary) -> long`: total updates the sketch absorbed — the
  * `N` of the ε·N band, read from the stored header. */
case class CmsTotal(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_total requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_total"

  override protected def nullSafeEval(a: Any): Any =
    CmsUtil.total(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.CmsUtil.total($a)")

  override protected def withNewChildInternal(newChild: Expression): CmsTotal =
    copy(child = newChild)
}
