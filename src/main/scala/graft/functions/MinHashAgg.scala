package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise minimum over `array<long>` rows — the MinHash signature
  * combiner (typed `Aggregator`, the engine's `Reducer` generalization,
  * SURVEY.md §3.3).
  *
  * Folding k hashes per shingle into the signature inside ONE aggregate
  * beats exploding k rows per shingle and re-grouping: the explode form
  * shuffles k× the data (measured 20 s at sf0.1 for k=64); this buffer
  * rides the normal partial/final aggregation path, so each map task
  * ships one k-long buffer per doc, not k rows per shingle.
  */
object ElementwiseMin extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], row: Seq[Long]): Array[Long] =
    if (buf.isEmpty) row.toArray
    else {
      var i = 0
      while (i < buf.length) { if (row(i) < buf(i)) buf(i) = row(i); i += 1 }
      buf
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      var i = 0
      while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object VectorAggs {
  /** `elementwise_min(array<long>)` as a Column aggregate. */
  def elementwiseMin(c: Column): Column =
    udaf(ElementwiseMin, ExpressionEncoder[Seq[Long]]()).apply(c)
}
