package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Mutable moment accumulator for d-dimensional vectors: count, per-dim
  * sums, and the upper triangle of the second-moment matrix Σ vᵢ·vⱼ —
  * everything a covariance matrix (and so PCA) needs, in
  * 1 + d + d(d+1)/2 doubles. For d = 64 that is ~17 KB per partition:
  * map tasks ship ONE such buffer each, never rows — the
  * [[KllSketchAgg]] stored-summary discipline applied to second
  * moments. */
final class CovBuffer(val d: Int) extends Serializable {
  var n: Long = 0L
  val sums = new Array[Double](d)
  val prods = new Array[Double](d * (d + 1) / 2) // upper triangle, row-major

  def update(v: Array[Double]): Unit = {
    require(v.length == d, s"cov_accum_agg: expected $d dims, got ${v.length}")
    n += 1
    var i = 0
    var t = 0
    while (i < d) {
      sums(i) += v(i)
      var j = i
      while (j < d) { prods(t) += v(i) * v(j); t += 1; j += 1 }
      i += 1
    }
  }

  def merge(o: CovBuffer): Unit = {
    require(o.d == d, s"cov_accum_agg: merging d=${o.d} into d=$d")
    n += o.n
    var i = 0
    while (i < d) { sums(i) += o.sums(i); i += 1 }
    var t = 0
    while (t < prods.length) { prods(t) += o.prods(t); t += 1 }
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 8 * (d + prods.length))
    bb.putInt(d).putLong(n)
    sums.foreach(bb.putDouble)
    prods.foreach(bb.putDouble)
    bb.array()
  }
}

object CovUtil {
  def fromBytes(bytes: Array[Byte]): CovBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CovBuffer(bb.getInt)
    buf.n = bb.getLong
    var i = 0
    while (i < buf.sums.length) { buf.sums(i) = bb.getDouble; i += 1 }
    var t = 0
    while (t < buf.prods.length) { buf.prods(t) = bb.getDouble; t += 1 }
    buf
  }

  /** Population covariance matrix E[vᵢvⱼ] − E[vᵢ]E[vⱼ] from a buffer. */
  def covariance(buf: CovBuffer): Array[Array[Double]] = {
    val d = buf.d
    require(buf.n > 0, "cov_accum_agg: empty buffer")
    val n = buf.n.toDouble
    val mean = buf.sums.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = buf.prods(t) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        t += 1
        j += 1
      }
      i += 1
    }
    cov
  }

  /** Eigen-decomposition of a symmetric matrix by cyclic Jacobi
    * rotations (Golub & Van Loan §8.5 — public textbook method):
    * deterministic given the matrix, O(d³) per sweep, converges
    * quadratically; d is BOUNDED (the embedding width), so this is
    * driver-side scalar work on a d×d summary, never data-sized.
    * Returns (eigenvalues, eigenvectors as rows), sorted descending. */
  def jacobiEigen(m: Array[Array[Double]],
                  maxSweeps: Int = 50): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag: Double = {
      var s = 0.0
      for (i <- 0 until d; j <- i + 1 until d) s += a(i)(j) * a(i)(j)
      math.sqrt(s)
    }
    val scale = math.max(1e-300, m.indices.map(i => math.abs(m(i)(i))).max)
    var sweep = 0
    while (sweep < maxSweeps && offDiag > 1e-14 * scale) {
      for (p <- 0 until d; q <- p + 1 until d if math.abs(a(p)(q)) > 1e-300) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        // sgn(0) = 1, NOT signum's 0: equal diagonals (θ = 0) need the
        // full 45° rotation, not a no-op
        val sg = if (theta >= 0.0) 1.0 else -1.0
        val t = sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (k <- 0 until d) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
        }
        for (k <- 0 until d) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
        }
        for (k <- 0 until d) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until d).map(k => v(k)(i)).toArray).toArray)
  }
}

/** `cov_accum_agg(vec array<float|double>, d) -> binary`: per-group
  * second-moment blob ([[CovBuffer]] layout). One ~d²/2-double buffer
  * per map task; the reduced blob is the ONLY thing the driver ever
  * pulls for PCA — scale-free in the row count. */
case class CovAccumAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovBuffer] {

  require(d >= 1 && d <= 4096, s"cov_accum_agg d out of range: $d")

  private val elemDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cov_accum_agg requires array<float|double>, got ${other.catalogString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cov_accum_agg"

  override def createAggregationBuffer(): CovBuffer = new CovBuffer(d)

  override def update(buf: CovBuffer, input: InternalRow): CovBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val vals = new Array[Double](arr.numElements())
      var i = 0
      while (i < vals.length) {
        // a null ELEMENT would otherwise read as 0.0 and silently
        // corrupt every mean/covariance — fail in the aggregate's
        // strict require() style instead
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"cov_accum_agg: null element at index $i of a ${vals.length}-dim " +
            "vector — moment accumulation over partial vectors is undefined")
        vals(i) = if (elemDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
        i += 1
      }
      buf.update(vals)
    }
    buf
  }

  override def merge(buf: CovBuffer, other: CovBuffer): CovBuffer = {
    buf.merge(other)
    buf
  }

  override def eval(buf: CovBuffer): Any = buf.toBytes
  override def serialize(buf: CovBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): CovBuffer = CovUtil.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CovAccumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovAccumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
