package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Heap plumbing for [[BoundedTopK]], kept outside the expression so the
  * ordering is testable and the case-class stays a thin Catalyst shell.
  */
object BoundedTopKUtil {
  /** Rank contract: better = higher score, ties broken by SMALLER id —
    * identical to `row_number() over (order by score desc, id)`. The
    * ordering is "worst-greatest" so a max-PriorityQueue keeps the
    * eviction candidate at its head. */
  object WorstFirst extends Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // lower score ranks worse
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // higher id ranks worse
    }
  }

  type Heap = scala.collection.mutable.PriorityQueue[(Double, Long)]

  def empty(): Heap = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(WorstFirst)

  def insert(h: Heap, k: Int, s: Double, id: Long): Unit =
    if (h.size < k) h.enqueue((s, id))
    else if (WorstFirst.compare((s, id), h.head) < 0) { // strictly less-worst
      h.dequeue(); h.enqueue((s, id))
    }
}

/** `topk_pairs(score double, id bigint, k) -> array<struct<score,id>>`:
  * group-wise top-k as a bounded-heap [[TypedImperativeAggregate]] — the
  * aggregation-path alternative to `row_number() OVER (...) <= k`
  * (SURVEY.md §7.3 "Group-wise top-k at scale").
  *
  * Why it exists: the window form shuffles EVERY row of a group to one
  * reducer and sorts it (WindowGroupLimit prunes each map partition to k
  * first, which usually suffices — PlanGuardSpec pins that). This form
  * instead rides the normal partial/final aggregation: each map task
  * keeps a k-entry heap per group and ships k rows, the reducer merges
  * heaps — no sort, state O(k) regardless of group skew, and a
  * billion-row hot group costs the same shuffle bytes as a cold one.
  * Result is sorted best-first and byte-equal to the window form's rank
  * order (ties: higher score first, then smaller id — pinned by the
  * q34/q8 shared oracle).
  *
  * Null semantics: null-score rows are SKIPPED, like any SQL aggregate
  * ignoring null inputs — this differs from the window form, which
  * ranks a null-score row (nulls-last) and still emits it. The shared
  * q34/q8 oracle is valid because o_totalprice is non-null; for a
  * nullable score column, filter nulls first if window parity matters.
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopKUtil.Heap] {
  import BoundedTopKUtil._

  require(k > 0, s"topk_pairs needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_pairs requires (double, bigint), got (${s.catalogString}, ${i.catalogString})")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): Heap = empty()

  override def update(h: Heap, input: InternalRow): Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(h, k, s.asInstanceOf[Double], i.asInstanceOf[Long])
    h
  }

  override def merge(h: Heap, other: Heap): Heap = {
    other.foreach { case (s, i) => insert(h, k, s, i) }
    h
  }

  override def eval(h: Heap): Any = {
    // sorted(WorstFirst) is ascending worstness = best-first
    val rows = h.toArray.sorted(WorstFirst).map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i)): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(h: Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(h.size)
    h.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = empty()
    var j = 0
    while (j < n) { h.enqueue((in.readDouble(), in.readLong())); j += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}
