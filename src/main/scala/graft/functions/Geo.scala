package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Geohash kernel (the public base-32 standard: bisect longitude and
  * latitude alternately, lon first; 5 bits per character). Static
  * object so generated code calls it directly.
  *
  * GeoSpec pins the encoding against published vectors (the classic
  * (57.64911, 10.40744) → "u4pruydqqvj" and (42.605, -5.603) →
  * "ezs42") and proves the decode inverse structurally (every decoded
  * bounding box contains its point; widths halve per bit), so the
  * alphabet and bit order cannot drift. */
object GeoUtil {

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
  private val CharIdx: Array[Int] = {
    val a = Array.fill(128)(-1)
    Base32.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Geohash of (lat, lon) at `chars` characters (≤ 22: beyond that
    * the 5-bit steps drop under double ulp and add nothing).
    *
    * The upper bounds are EXCLUSIVE (lat < 90, lon < 180): every cell's
    * decoded box is half-open (`[lo, hi)` — [[decodeBox]]), so the
    * inclusive boundary coordinates would encode fine yet violate the
    * containment invariant qgeo_cells certifies per row (point ∈ its
    * own decoded box). Callers with a literal lon = 180 should wrap it
    * to -180 (the same meridian); lat = 90 has no half-open home by
    * construction and is rejected loudly (r15 advice). */
  def encode(lat: Double, lon: Double, chars: Int): String = {
    require(chars >= 1 && chars <= 22, s"geohash precision out of range: $chars")
    require(lat >= -90 && lat < 90 && lon >= -180 && lon < 180,
      s"geohash: coordinates out of half-open range [-90,90)x[-180,180): " +
        s"($lat, $lon) — wrap lon 180 to -180")
    val sb = new java.lang.StringBuilder(chars)
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var evenBit = true // lon first
    var bit = 0
    var idx = 0
    while (sb.length < chars) {
      if (evenBit) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { idx = (idx << 1) | 1; lonLo = mid }
        else { idx = idx << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { idx = (idx << 1) | 1; latLo = mid }
        else { idx = idx << 1; latHi = mid }
      }
      evenBit = !evenBit
      bit += 1
      if (bit == 5) { sb.append(Base32.charAt(idx)); bit = 0; idx = 0 }
    }
    sb.toString
  }

  /** Bounding box (latLo, latHi, lonLo, lonHi) of a geohash cell. */
  def decodeBox(hash: String): (Double, Double, Double, Double) = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var evenBit = true
    for (c <- hash) {
      val idx =
        if (c.toInt < 128 && CharIdx(c.toInt) >= 0) CharIdx(c.toInt)
        else throw new IllegalArgumentException(s"geohash: bad character '$c'")
      var b = 4
      while (b >= 0) {
        val set = ((idx >> b) & 1) == 1
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2
          if (set) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (set) latLo = mid else latHi = mid
        }
        evenBit = !evenBit
        b -= 1
      }
    }
    (latLo, latHi, lonLo, lonHi)
  }

  /** Haversine great-circle distance in km (IUGG mean radius
    * 6371.0088 — the same constant the oracle SQL spells out). */
  def haversineKm(lat1: Double, lon1: Double,
                  lat2: Double, lon2: Double): Double = {
    val r = 6371.0088
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon / 2) * math.sin(dLon / 2)
    2 * r * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** UTF8String wrapper for codegen. */
  def encodeUtf8(lat: Double, lon: Double, chars: Int): UTF8String =
    UTF8String.fromString(encode(lat, lon, chars))
}

/** `geohash(lat double, lon double, chars) -> string` — the standard
  * base-32 geohash of a coordinate, for cell bucketing (prefix length
  * = cell size) and human-readable spatial keys. Codegen'd; `chars`
  * is a literal (the cell granularity is a plan-time choice, like a
  * shingle width). Out-of-range coordinates fail loudly — silently
  * clamping a bad coordinate into a real cell would poison a spatial
  * index. */
case class GeohashEncode(left: Expression, right: Expression, chars: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, DoubleType) =>
        if (chars >= 1 && chars <= 22) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"geohash precision must be in [1, 22], got $chars")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"geohash requires (double, double), got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "geohash"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoUtil.encodeUtf8(a.asInstanceOf[Double], b.asInstanceOf[Double], chars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GeoUtil.encodeUtf8($a, $b, $chars)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GeohashEncode =
    copy(left = newLeft, right = newRight)
}
