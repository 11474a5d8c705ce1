package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

import graft.sources.Tables
import Multimodal.AudioRecord

/** REAL FLAC codec for the fixed-predictor subset (RFC 9639) — pure
  * JVM, the COMPRESSED leg of the audio pipeline that [[Multimodal]]'s
  * RIFF/WAVE row leaves uncompressed.
  *
  * Unlike the H.264 entropy tables (whose sparse-residual VLC codes
  * could not be verified in this sandbox — [[H264Cavlc]]'s permanent
  * adjudication), EVERYTHING FLAC needs is closed-form in the spec
  * itself: the fixed predictors are the binomial difference filters
  * (RFC 9639 §10.2.2), Rice residual coding is parameterized arithmetic
  * (§10.2.6), and the integrity chain (frame-header CRC-8 poly 0x07,
  * frame CRC-16 poly 0x8005, STREAMINFO MD5 of the unencoded samples —
  * §9.1.2/§9.3) has published check values this module pins as
  * known-answer canaries. So an exactness proof IS available here, and
  * the module takes the same bar the other codecs set:
  *
  *  - encodes conformant streams (STREAMINFO + fixed-blocksize frames;
  *    constant / verbatim / fixed-predictor orders 0-4 chosen by cost;
  *    optional order-2 LPC emission to exercise that path; Rice
  *    partitions with optimal per-partition parameters + the raw-bits
  *    escape; wasted-bits-per-sample detection; stereo decorrelation
  *    left/side, right/side, mid/side) — any FLAC player decodes them;
  *  - decodes the full non-LPC surface PLUS general LPC subframes
  *    (orders 1-32, any precision/shift), verifying CRC-8 per header,
  *    CRC-16 per frame, sequential frame numbers, and the STREAMINFO
  *    MD5 over the reconstructed interleaved samples — a hash-verified
  *    END-TO-END proof, not a field-by-field parse;
  *  - QUARANTINES everything else loudly as None: broken sync, any
  *    reserved bit set, reserved subframe types, CRC or MD5 mismatch,
  *    undivisible Rice partition orders, bitstream underrun.
  *
  * Scan-side in `mapPartitions`, zero shuffle, no driver round-trips:
  * each ~megabyte payload decodes where it is read, which is the only
  * shape that survives 100 TB of audio.
  *
  * Reference heritage: the reference engine (map___reduce/mapreduce.c)
  * treats records as opaque byte strings; this module is part of the
  * generalized multimodal surface SURVEY §2.2b layers on top.
  */
object Flac {

  private[graft] final class FlacMalformed(msg: String)
    extends RuntimeException(msg)

  private def bad(msg: String): Nothing = throw new FlacMalformed(msg)

  // ─────────────────────────────────────────────────────────────────
  // Integrity primitives (RFC 9639 §9.1.2, §9.3): CRC-8 poly 0x07,
  // CRC-16 poly 0x8005, both init 0, MSB-first, no final xor.
  // FlacSpec pins the published check values ("123456789" → 0xF4 /
  // 0xFEE8) so a transcription slip cannot survive.
  // ─────────────────────────────────────────────────────────────────

  private[graft] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xFF
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
        b += 1
      }
      i += 1
    }
    crc
  }

  private[graft] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xFF) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
        else (crc << 1) & 0xFFFF
        b += 1
      }
      i += 1
    }
    crc
  }

  // ─────────────────────────────────────────────────────────────────
  // Bit I/O (MSB-first). The writer exposes its byte buffer so CRCs
  // can be computed over exactly the bytes emitted so far; both sides
  // only cross byte boundaries where the spec byte-aligns (header end,
  // frame end), so CRC slices are always whole bytes.
  // ─────────────────────────────────────────────────────────────────

  private[graft] final class BitWriter {
    private var buf = new Array[Byte](256)
    private var len = 0
    private var cur = 0
    private var nBits = 0

    private def push(b: Int): Unit = {
      if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
      buf(len) = b.toByte
      len += 1
    }

    def u(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1L).toInt
        nBits += 1
        if (nBits == 8) { push(cur); cur = 0; nBits = 0 }
        i -= 1
      }
    }

    /** Unary per §10.2.6: `q` zero bits then a one bit. */
    def unary(q: Int): Unit = { u(0L, q); u(1L, 1) }

    def alignZero(): Unit = if (nBits != 0) u(0L, 8 - nBits)

    def aligned: Boolean = nBits == 0
    def byteLen: Int = len
    def bytesSoFar: Array[Byte] = buf // valid in [0, byteLen)
    def toBytes: Array[Byte] = {
      require(nBits == 0, "flac: unaligned writer")
      java.util.Arrays.copyOf(buf, len)
    }
  }

  private[graft] final class BitReader(bytes: Array[Byte]) {
    private var pos = 0 // bit position

    def bitPos: Int = pos
    def bytePos: Int = { require(pos % 8 == 0); pos / 8 }
    def more: Boolean = pos < bytes.length * 8

    def u(bits: Int): Long = {
      var v = 0L
      var i = 0
      while (i < bits) {
        if (pos >= bytes.length * 8) bad("bitstream underrun")
        val b = (bytes(pos >> 3) >> (7 - (pos & 7))) & 1
        v = (v << 1) | b
        pos += 1
        i += 1
      }
      v
    }

    def s(bits: Int): Int = {
      val v = u(bits)
      ((v << (64 - bits)) >> (64 - bits)).toInt // sign-extend
    }

    /** Unary: count zero bits until the terminating one. */
    def unary(): Int = {
      var q = 0
      while (u(1) == 0) {
        q += 1
        if (q > (1 << 20)) bad("unary run too long")
      }
      q
    }

    def align(): Unit =
      while (pos % 8 != 0) if (u(1) != 0) bad("nonzero alignment bit")
  }

  // ─────────────────────────────────────────────────────────────────
  // Coded number (§9.1.5): UTF-8-style variable length, up to 36 bits.
  // ─────────────────────────────────────────────────────────────────

  private[graft] def codedNumberBytes(v: Long): Array[Byte] = {
    require(v >= 0 && v < (1L << 36), s"flac: coded number out of range: $v")
    if (v <= 0x7F) Array(v.toByte)
    else {
      // (payload bits, lead-byte prefix) per RFC 9639 §9.1.5
      val shapes = Seq((11, 0xC0, 1), (16, 0xE0, 2), (21, 0xF0, 3),
        (26, 0xF8, 4), (31, 0xFC, 5), (36, 0xFE, 6))
      val (bits, prefix, cont) = shapes.find { case (b, _, _) => v < (1L << b) }
        .getOrElse(bad("coded number too large"))
      val out = new Array[Byte](cont + 1)
      out(0) = (prefix | ((v >> (6 * cont)) & ((1 << (bits - 6 * cont)) - 1))).toByte
      var i = 0
      while (i < cont) {
        out(cont - i) = (0x80 | ((v >> (6 * i)) & 0x3F)).toByte
        i += 1
      }
      out
    }
  }

  private[graft] def readCodedNumber(br: BitReader): Long = {
    val first = br.u(8).toInt
    if ((first & 0x80) == 0) first.toLong
    else {
      var cont = 0
      var mask = 0x40
      while ((first & mask) != 0) { cont += 1; mask >>= 1 }
      if (cont < 1 || cont > 6) bad(s"invalid coded-number lead byte: $first")
      var v = (first & (mask - 1)).toLong
      var i = 0
      while (i < cont) {
        val b = br.u(8).toInt
        if ((b & 0xC0) != 0x80) bad("invalid coded-number continuation byte")
        v = (v << 6) | (b & 0x3F)
        i += 1
      }
      v
    }
  }

  // ─────────────────────────────────────────────────────────────────
  // Fixed predictors (§10.2.2): residual r[i] for orders 0-4 are the
  // binomial difference filters; reconstruction inverts them exactly
  // in integer arithmetic.
  // ─────────────────────────────────────────────────────────────────

  private def fixedResidual(x: Array[Int], order: Int): Array[Long] = {
    val n = x.length - order
    val r = new Array[Long](n)
    var i = 0
    while (i < n) {
      val j = i + order
      r(i) = order match {
        case 0 => x(j).toLong
        case 1 => x(j).toLong - x(j - 1)
        case 2 => x(j).toLong - 2L * x(j - 1) + x(j - 2)
        case 3 => x(j).toLong - 3L * x(j - 1) + 3L * x(j - 2) - x(j - 3)
        case 4 => x(j).toLong - 4L * x(j - 1) + 6L * x(j - 2) - 4L * x(j - 3) + x(j - 4)
      }
      i += 1
    }
    r
  }

  private def fixedRestore(x: Array[Int], order: Int, r: Array[Long]): Unit = {
    var i = 0
    while (i < r.length) {
      val j = i + order
      val p: Long = order match {
        case 0 => 0L
        case 1 => x(j - 1).toLong
        case 2 => 2L * x(j - 1) - x(j - 2)
        case 3 => 3L * x(j - 1) - 3L * x(j - 2) + x(j - 3)
        case 4 => 4L * x(j - 1) - 6L * x(j - 2) + 4L * x(j - 3) - x(j - 4)
      }
      val v = p + r(i)
      if (v < Int.MinValue || v > Int.MaxValue) bad("fixed predictor overflow")
      x(j) = v.toInt
      i += 1
    }
  }

  // Zigzag map (§10.2.6): signed residual → unsigned Rice symbol.
  private def zigzag(v: Long): Long = if (v >= 0) v << 1 else (-v << 1) - 1
  private def unzigzag(u: Long): Long = if ((u & 1) == 0) u >> 1 else -((u + 1) >> 1)

  // ─────────────────────────────────────────────────────────────────
  // Rice residual coding (§10.2.6): method 0 (4-bit params) / 1
  // (5-bit), 2^po partitions, escape = all-ones param → 5-bit raw
  // width. Encoder picks the cheapest (method, po, params) exactly.
  // ─────────────────────────────────────────────────────────────────

  private def riceCostBits(zz: Array[Long], from: Int, until: Int, k: Int): Long = {
    var bits = 0L
    var i = from
    while (i < until) { bits += (zz(i) >>> k) + 1 + k; i += 1 }
    bits
  }

  /** Best (param, costBits) for one partition under `maxParam`; the
    * escape (raw `w`-bit residuals, w = max bit length) is compared
    * too and signalled as param = -w - 1. */
  private def bestPartitionCode(zz: Array[Long], from: Int, until: Int,
                                maxParam: Int): (Int, Long) = {
    var bestK = 0
    var bestBits = Long.MaxValue
    var k = 0
    while (k <= maxParam) {
      val c = riceCostBits(zz, from, until, k)
      if (c < bestBits) { bestBits = c; bestK = k }
      k += 1
    }
    // raw escape: 5-bit width field + n*w bits, w = widest SIGNED residual
    var w = 0
    var i = from
    while (i < until) {
      val v = unzigzag(zz(i))
      val need =
        if (v == 0) 0
        else 65 - java.lang.Long.numberOfLeadingZeros(if (v < 0) ~v else v)
      if (need > w) w = need
      i += 1
    }
    if (w > 31) bad("residual exceeds 31 bits") // cannot happen for ≤24-bit input
    val rawBits = 5L + (until - from).toLong * w
    if (rawBits < bestBits) (-w - 1, rawBits) else (bestK, bestBits)
  }

  private def writeResidual(bw: BitWriter, zz: Array[Long], blockSize: Int,
                            order: Int): Unit = {
    // choose method by the largest param any partition wants
    var bestPo = 0
    var bestCost = Long.MaxValue
    var bestCodes: Array[(Int, Long)] = null
    var po = 0
    while (po <= 6) {
      val parts = 1 << po
      if (blockSize % parts == 0 && (blockSize >> po) > order) {
        val codes = new Array[(Int, Long)](parts)
        var cost = 0L
        var p = 0
        while (p < parts) {
          val from = if (p == 0) 0 else (blockSize >> po) * p - order
          val until = (blockSize >> po) * (p + 1) - order
          codes(p) = bestPartitionCode(zz, from, until, 30)
          cost += codes(p)._2
          p += 1
        }
        // header overhead: 2 (method) + 4 (order) + one param field per
        // partition, charged at the width the candidate's own codes
        // FORCE — a param > 14 needs method 1's 5-bit fields, so
        // charging a flat 4 would bias the compare toward partition
        // orders that are mildly worse once written (r15 advice)
        val candKBits = if (codes.exists(_._1 > 14)) 5L else 4L
        cost += 2 + 4 + parts.toLong * candKBits
        if (cost < bestCost) { bestCost = cost; bestPo = po; bestCodes = codes }
      }
      po += 1
    }
    if (bestCodes == null) bad(s"no admissible partition order for block $blockSize order $order")
    val maxK = bestCodes.map(_._1).max
    val method = if (maxK <= 14) 0 else 1
    val kBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xF else 0x1F
    bw.u(method, 2)
    bw.u(bestPo, 4)
    var p = 0
    while (p < (1 << bestPo)) {
      val from = if (p == 0) 0 else (blockSize >> bestPo) * p - order
      val until = (blockSize >> bestPo) * (p + 1) - order
      val (k0, _) = bestPartitionCode(zz, from, until, if (method == 0) 14 else 30)
      if (k0 < 0) { // raw escape
        val w = -k0 - 1
        bw.u(escape, kBits)
        bw.u(w, 5)
        var i = from
        while (i < until) { bw.u(unzigzag(zz(i)) & ((1L << w) - 1), w); i += 1 }
      } else {
        bw.u(k0, kBits)
        var i = from
        while (i < until) {
          val z = zz(i)
          bw.unary((z >>> k0).toInt)
          bw.u(z & ((1L << k0) - 1), k0)
          i += 1
        }
      }
      p += 1
    }
  }

  private def readResidual(br: BitReader, blockSize: Int, order: Int): Array[Long] = {
    val method = br.u(2).toInt
    if (method > 1) bad(s"reserved residual coding method $method")
    val kBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xF else 0x1F
    val po = br.u(4).toInt
    val parts = 1 << po
    if (blockSize % parts != 0) bad("partition order does not divide block size")
    if ((blockSize >> po) <= order && parts > 1) bad("first partition would be empty")
    if (blockSize - order <= 0) bad("no residuals to code")
    val out = new Array[Long](blockSize - order)
    var idx = 0
    var p = 0
    while (p < parts) {
      val n = (blockSize >> po) - (if (p == 0) order else 0)
      if (n < 0) bad("negative partition length")
      val k = br.u(kBits).toInt
      if (k == escape) {
        val w = br.u(5).toInt
        var i = 0
        while (i < n) {
          out(idx) = if (w == 0) 0L else br.s(w).toLong
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < n) {
          val q = br.unary()
          val low = if (k == 0) 0L else br.u(k)
          out(idx) = unzigzag((q.toLong << k) | low)
          idx += 1; i += 1
        }
      }
      p += 1
    }
    out
  }

  // ─────────────────────────────────────────────────────────────────
  // Subframes (§10.2)
  // ─────────────────────────────────────────────────────────────────

  /** Wasted-bits count shared by every sample of the block (0 if any
    * sample is odd or all are zero — constant handles the latter). */
  private def wastedBits(x: Array[Int], bps: Int): Int = {
    var orAll = 0
    var i = 0
    while (i < x.length) { orAll |= x(i); i += 1 }
    if (orAll == 0) 0 else math.min(Integer.numberOfTrailingZeros(orAll), bps - 1)
  }

  /** Emit one subframe for channel samples `x` at `bps` effective bits
    * (already includes the +1 of a side channel). `lpcOrder2` swaps the
    * fixed order-2 emission for the equivalent explicit LPC subframe
    * (coefficients [2,-1], shift 0) to exercise the LPC bitstream. */
  private def writeSubframe(bw: BitWriter, x: Array[Int], bps: Int,
                            lpcOrder2: Boolean): Unit = {
    val allEqual = x.forall(_ == x(0))
    if (allEqual) {
      bw.u(0, 1); bw.u(0, 6); bw.u(0, 1) // constant, no wasted bits
      bw.u(x(0).toLong & ((1L << bps) - 1), bps)
      return
    }
    val wb = wastedBits(x, bps)
    val xs = if (wb == 0) x else x.map(_ >> wb)
    val ebps = bps - wb
    // pick the fixed order minimizing the zigzag total (the standard
    // greedy estimator), capped by available warmup samples
    val maxOrder = math.min(4, xs.length - 1)
    var bestOrder = 0
    var bestSum = Long.MaxValue
    var o = 0
    while (o <= maxOrder) {
      val r = fixedResidual(xs, o)
      var s = 0L
      var i = 0
      while (i < r.length) { s += zigzag(r(i)); i += 1 }
      if (s < bestSum) { bestSum = s; bestOrder = o }
      o += 1
    }
    // verbatim fallback when prediction does not beat raw samples
    val verbatimBits = xs.length.toLong * ebps
    if (bestSum / math.max(1, xs.length - bestOrder) >= (1L << (ebps - 1)) &&
      verbatimBits < bestSum) {
      bw.u(0, 1); bw.u(1, 6)
      if (wb == 0) bw.u(0, 1) else { bw.u(1, 1); bw.unary(wb - 1) }
      var i = 0
      while (i < xs.length) { bw.u(xs(i).toLong & ((1L << ebps) - 1), ebps); i += 1 }
      return
    }
    val useLpc = lpcOrder2 && bestOrder == 2
    if (useLpc) {
      bw.u(0, 1); bw.u(0x20 | (2 - 1), 6) // LPC, order 2
    } else {
      bw.u(0, 1); bw.u(0x08 | bestOrder, 6) // fixed, order in low bits
    }
    if (wb == 0) bw.u(0, 1) else { bw.u(1, 1); bw.unary(wb - 1) }
    var i = 0
    while (i < bestOrder) { bw.u(xs(i).toLong & ((1L << ebps) - 1), ebps); i += 1 }
    if (useLpc) {
      bw.u(4 - 1, 4) // coefficient precision 4
      bw.u(0, 5) // shift 0
      bw.u(2L & 0xF, 4) // coef[0] = 2
      bw.u(-1L & 0xF, 4) // coef[1] = -1
    }
    val r = fixedResidual(xs, bestOrder)
    val zz = new Array[Long](r.length)
    i = 0
    while (i < r.length) { zz(i) = zigzag(r(i)); i += 1 }
    writeResidual(bw, zz, xs.length, bestOrder)
  }

  /** Decode one subframe of `blockSize` samples at effective `bps`. */
  private def readSubframe(br: BitReader, blockSize: Int, bps: Int): Array[Int] = {
    if (br.u(1) != 0) bad("subframe padding bit set")
    val ty = br.u(6).toInt
    val wb =
      if (br.u(1) == 0) 0
      else br.unary() + 1
    if (wb >= bps) bad(s"wasted bits $wb >= bit depth $bps")
    val ebps = bps - wb
    val x = new Array[Int](blockSize)
    if (ty == 0) { // constant
      val v = br.s(ebps)
      java.util.Arrays.fill(x, v)
    } else if (ty == 1) { // verbatim
      var i = 0
      while (i < blockSize) { x(i) = br.s(ebps); i += 1 }
    } else if ((ty & 0x38) == 0x08 && (ty & 0x07) <= 4) { // fixed
      val order = ty & 0x07
      if (order > blockSize) bad("fixed order exceeds block size")
      var i = 0
      while (i < order) { x(i) = br.s(ebps); i += 1 }
      val r = readResidual(br, blockSize, order)
      fixedRestore(x, order, r)
    } else if ((ty & 0x20) != 0) { // LPC
      val order = (ty & 0x1F) + 1
      if (order > blockSize) bad("LPC order exceeds block size")
      var i = 0
      while (i < order) { x(i) = br.s(ebps); i += 1 }
      val precM1 = br.u(4).toInt
      if (precM1 == 0xF) bad("invalid LPC coefficient precision")
      val prec = precM1 + 1
      val shift = br.s(5)
      if (shift < 0) bad("negative LPC shift")
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = br.s(prec); i += 1 }
      val r = readResidual(br, blockSize, order)
      i = 0
      while (i < r.length) {
        val j = i + order
        var acc = 0L
        var c = 0
        while (c < order) { acc += coefs(c).toLong * x(j - 1 - c); c += 1 }
        val v = (acc >> shift) + r(i)
        if (v < Int.MinValue || v > Int.MaxValue) bad("LPC overflow")
        x(j) = v.toInt
        i += 1
      }
    } else bad(s"reserved subframe type $ty")
    if (wb == 0) x else x.map(_ << wb)
  }

  // ─────────────────────────────────────────────────────────────────
  // Frames (§9.1)
  // ─────────────────────────────────────────────────────────────────

  /** Stereo decorrelation modes; `Auto` picks the cheapest per frame
    * by the order-2 zigzag-sum estimator on each candidate channel. */
  sealed trait StereoMode
  case object Independent extends StereoMode
  case object LeftSide extends StereoMode
  case object RightSide extends StereoMode
  case object MidSide extends StereoMode
  case object Auto extends StereoMode

  private def channelCost(x: Array[Int]): Long = {
    val o = math.min(2, x.length - 1)
    val r = fixedResidual(x, o)
    var s = 0L
    var i = 0
    while (i < r.length) { s += zigzag(r(i)); i += 1 }
    s
  }

  private def pickStereo(l: Array[Int], r: Array[Int]): StereoMode = {
    val side = Array.tabulate(l.length)(i => l(i) - r(i))
    val mid = Array.tabulate(l.length)(i => (l(i) + r(i)) >> 1)
    val cl = channelCost(l); val cr = channelCost(r)
    val cs = channelCost(side); val cm = channelCost(mid)
    val costs = Seq(
      (Independent: StereoMode) -> (cl + cr),
      (LeftSide: StereoMode) -> (cl + cs),
      (RightSide: StereoMode) -> (cs + cr),
      (MidSide: StereoMode) -> (cm + cs))
    costs.minBy(_._2)._1
  }

  private val BlockSizeCodes: Map[Int, Int] =
    (Map(192 -> 1) ++ (0 to 3).map(k => (576 << k) -> (2 + k)) ++
      (0 to 7).map(k => (256 << k) -> (8 + k))).toMap

  private val SampleRateTable: Map[Int, Int] = Map(
    1 -> 88200, 2 -> 176400, 3 -> 192000, 4 -> 8000, 5 -> 16000,
    6 -> 22050, 7 -> 24000, 8 -> 32000, 9 -> 44100, 10 -> 48000, 11 -> 96000)

  private val BitDepthCodes: Map[Int, Int] =
    Map(8 -> 1, 12 -> 2, 16 -> 4, 20 -> 5, 24 -> 6)

  private def writeFrame(out: java.io.ByteArrayOutputStream, frameNo: Long,
                         block: Array[Array[Int]], bps: Int, mode: StereoMode,
                         lpcOrder2: Boolean): Unit = {
    val bw = new BitWriter
    val n = block(0).length
    bw.u(0x3FFE, 14) // sync
    bw.u(0, 1) // reserved
    bw.u(0, 1) // blocking strategy: fixed → coded number is frame no
    val (bsCode, bsExtra) = BlockSizeCodes.get(n) match {
      case Some(c) => (c, -1)
      case None if n <= 256 => (6, 8)
      case None => (7, 16)
    }
    bw.u(bsCode, 4)
    bw.u(0, 4) // sample rate: from STREAMINFO
    val chMode = if (block.length != 2) Independent else mode
    val chCode = chMode match {
      case LeftSide => 8
      case RightSide => 9
      case MidSide => 10
      case _ => block.length - 1
    }
    bw.u(chCode, 4)
    bw.u(BitDepthCodes.getOrElse(bps, 0).toLong, 3)
    bw.u(0, 1) // reserved
    for (b <- codedNumberBytes(frameNo)) bw.u(b & 0xFFL, 8)
    if (bsExtra == 8) bw.u(n - 1, 8)
    else if (bsExtra == 16) bw.u(n - 1, 16)
    bw.u(crc8(bw.bytesSoFar, 0, bw.byteLen), 8)
    chMode match {
      case LeftSide =>
        val side = Array.tabulate(n)(i => block(0)(i) - block(1)(i))
        writeSubframe(bw, block(0), bps, lpcOrder2)
        writeSubframe(bw, side, bps + 1, lpcOrder2)
      case RightSide =>
        val side = Array.tabulate(n)(i => block(0)(i) - block(1)(i))
        writeSubframe(bw, side, bps + 1, lpcOrder2)
        writeSubframe(bw, block(1), bps, lpcOrder2)
      case MidSide =>
        val mid = Array.tabulate(n)(i => (block(0)(i) + block(1)(i)) >> 1)
        val side = Array.tabulate(n)(i => block(0)(i) - block(1)(i))
        writeSubframe(bw, mid, bps, lpcOrder2)
        writeSubframe(bw, side, bps + 1, lpcOrder2)
      case _ =>
        var c = 0
        while (c < block.length) { writeSubframe(bw, block(c), bps, lpcOrder2); c += 1 }
    }
    bw.alignZero()
    bw.u(crc16(bw.bytesSoFar, 0, bw.byteLen), 16)
    out.write(bw.toBytes)
  }

  private[graft] case class StreamInfo(blockSize: Int, sampleRate: Int,
                                       channels: Int, bps: Int,
                                       totalSamples: Long, md5: Array[Byte])

  /** Interleaved little-endian raw sample bytes — the MD5 input
    * (§9.1.2; ceil(bps/8) bytes per sample, signed LE). */
  private def rawSampleBytes(samples: Array[Array[Int]], bps: Int): Array[Byte] = {
    val bytesPer = (bps + 7) / 8
    val ch = samples.length
    val n = samples(0).length
    val out = new Array[Byte](n * ch * bytesPer)
    var i = 0
    var o = 0
    while (i < n) {
      var c = 0
      while (c < ch) {
        val v = samples(c)(i)
        var b = 0
        while (b < bytesPer) { out(o) = (v >> (8 * b)).toByte; o += 1; b += 1 }
        c += 1
      }
      i += 1
    }
    out
  }

  // ─────────────────────────────────────────────────────────────────
  // Public codec surface
  // ─────────────────────────────────────────────────────────────────

  /** Encode per-channel samples as one conformant FLAC stream.
    * `samples(c)(i)` is channel `c`, frame `i`; all channels equal
    * length; values must fit `bps` signed bits. */
  def encode(sampleRate: Int, bps: Int, samples: Array[Array[Int]],
             blockSize: Int = 4096, stereo: StereoMode = Auto,
             lpcOrder2: Boolean = false): Array[Byte] = {
    require(samples.nonEmpty && samples.forall(_.length == samples(0).length),
      "flac: channels must be non-empty and equal length")
    require(samples.length <= 8, "flac: at most 8 channels")
    require(bps >= 4 && bps <= 24, s"flac: bits per sample out of range: $bps")
    require(blockSize >= 16 && blockSize <= 65535, s"flac: bad block size $blockSize")
    require(sampleRate > 0 && sampleRate < (1 << 20), s"flac: bad sample rate")
    val lim = 1 << (bps - 1)
    require(samples.forall(_.forall(v => v >= -lim && v < lim)),
      s"flac: sample exceeds $bps signed bits")
    val n = samples(0).length
    require(n > 0, "flac: empty stream")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(rawSampleBytes(samples, bps))
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    val bw = new BitWriter
    bw.u(1, 1) // last metadata block
    bw.u(0, 7) // STREAMINFO
    bw.u(34, 24)
    // fixed-blocksize stream: min == max == blockSize (the last frame
    // may be shorter and is exempt, §8.2); spec floor is 16
    bw.u(blockSize, 16)
    bw.u(blockSize, 16)
    bw.u(0, 24); bw.u(0, 24) // frame sizes unknown
    bw.u(sampleRate, 20)
    bw.u(samples.length - 1, 3)
    bw.u(bps - 1, 5)
    bw.u(n.toLong, 36)
    for (b <- md5) bw.u(b & 0xFFL, 8)
    out.write(bw.toBytes)
    var frameNo = 0L
    var off = 0
    while (off < n) {
      val len = math.min(blockSize, n - off)
      val block = samples.map(ch => java.util.Arrays.copyOfRange(ch, off, off + len))
      val mode = stereo match {
        case Auto if samples.length == 2 => pickStereo(block(0), block(1))
        case m => m
      }
      writeFrame(out, frameNo, block, bps, mode, lpcOrder2)
      frameNo += 1
      off += len
    }
    out.toByteArray
  }

  /** Decoded stream: header fields + per-channel samples. */
  case class Decoded(sampleRate: Int, channels: Int, bps: Int,
                     samples: Array[Array[Int]])

  /** Decode a FLAC stream. Verifies every frame-header CRC-8, every
    * frame CRC-16, sequential frame numbering, and the STREAMINFO MD5
    * over the reconstructed samples; anything malformed or outside the
    * decodable surface quarantines as None. */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    try Some(decodeStrict(bytes))
    catch { case _: FlacMalformed | _: ArrayIndexOutOfBoundsException |
      _: IllegalArgumentException => None }

  private[graft] def decodeStrict(bytes: Array[Byte]): Decoded = {
    if (bytes.length < 4 + 4 + 34) bad("stream too short")
    if (bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a' || bytes(3) != 'C')
      bad("missing fLaC marker")
    val br = new BitReader(bytes)
    br.u(32) // marker
    // metadata blocks; STREAMINFO must come first (§8.1)
    var info: StreamInfo = null
    var last = false
    var first = true
    while (!last) {
      last = br.u(1) == 1
      val ty = br.u(7).toInt
      val len = br.u(24).toInt
      if (first && ty != 0) bad("first metadata block is not STREAMINFO")
      if (ty == 0) {
        if (!first) bad("duplicate STREAMINFO")
        if (len != 34) bad(s"STREAMINFO length $len")
        val minB = br.u(16).toInt
        val maxB = br.u(16).toInt
        if (minB < 16 || maxB < minB) bad("invalid block size bounds")
        br.u(24); br.u(24) // frame size bounds (unchecked, 0 = unknown)
        val rate = br.u(20).toInt
        if (rate == 0) bad("sample rate 0")
        val ch = br.u(3).toInt + 1
        val bps = br.u(5).toInt + 1
        val total = br.u(36)
        val md5 = new Array[Byte](16)
        var i = 0
        while (i < 16) { md5(i) = br.u(8).toByte; i += 1 }
        info = StreamInfo(maxB, rate, ch, bps, total, md5)
      } else {
        if (ty == 127) bad("forbidden metadata block type 127")
        var i = 0
        while (i < len) { br.u(8); i += 1 } // skip (padding, vorbis comment, …)
      }
      first = false
    }
    if (info == null) bad("no STREAMINFO")
    val acc = Array.fill(info.channels)(
      new scala.collection.mutable.ArrayBuilder.ofInt)
    var collected = 0L
    var expectFrame = 0L
    while (br.more && (info.totalSamples == 0 || collected < info.totalSamples)) {
      val frameStart = br.bytePos
      if (br.u(14) != 0x3FFE) bad("bad frame sync")
      if (br.u(1) != 0) bad("frame reserved bit set")
      val variable = br.u(1) == 1
      val bsCode = br.u(4).toInt
      val srCode = br.u(4).toInt
      val chCode = br.u(4).toInt
      val bdCode = br.u(3).toInt
      if (br.u(1) != 0) bad("frame reserved bit set")
      val coded = readCodedNumber(br)
      if (variable) bad("variable block size streams not supported")
      if (coded != expectFrame) bad(s"frame number $coded, expected $expectFrame")
      val blockSize = bsCode match {
        case 0 => bad("reserved block size code")
        case 6 => br.u(8).toInt + 1
        case 7 => br.u(16).toInt + 1
        case c => BlockSizeCodes.collectFirst { case (n, cc) if cc == c => n }
          .getOrElse(bad(s"block size code $c"))
      }
      val rate = srCode match {
        case 0 => info.sampleRate
        case 12 => br.u(8).toInt * 1000
        case 13 => br.u(16).toInt
        case 14 => br.u(16).toInt * 10
        case 15 => bad("invalid sample rate code")
        case c => SampleRateTable.getOrElse(c, bad(s"sample rate code $c"))
      }
      if (rate != info.sampleRate) bad("frame sample rate differs from STREAMINFO")
      val bps = bdCode match {
        case 0 => info.bps
        case 3 | 7 => bad(s"reserved bit depth code $bdCode")
        case c => BitDepthCodes.collectFirst { case (b, cc) if cc == c => b }
          .getOrElse(bad(s"bit depth code $bdCode"))
      }
      if (bps != info.bps) bad("frame bit depth differs from STREAMINFO")
      val headerEnd = br.bytePos
      val wantCrc8 = crc8(bytes, frameStart, headerEnd)
      if (br.u(8).toInt != wantCrc8) bad("frame header CRC-8 mismatch")
      val nCh = if (chCode <= 7) chCode + 1 else 2
      if (chCode > 10) bad(s"reserved channel assignment $chCode")
      if (nCh != info.channels) bad("frame channel count differs from STREAMINFO")
      val sub = new Array[Array[Int]](nCh)
      var c = 0
      while (c < nCh) {
        val extra = chCode match {
          case 8 => if (c == 1) 1 else 0 // left/side
          case 9 => if (c == 0) 1 else 0 // side/right
          case 10 => if (c == 1) 1 else 0 // mid/side
          case _ => 0
        }
        sub(c) = readSubframe(br, blockSize, bps + extra)
        c += 1
      }
      br.align()
      val frameEnd = br.bytePos
      val wantCrc16 = crc16(bytes, frameStart, frameEnd)
      if (br.u(16).toInt != wantCrc16) bad("frame CRC-16 mismatch")
      val (l, r) = chCode match {
        case 8 => // left/side → right = left - side
          (sub(0), Array.tabulate(blockSize)(i => sub(0)(i) - sub(1)(i)))
        case 9 => // side/right → left = right + side
          (Array.tabulate(blockSize)(i => sub(1)(i) + sub(0)(i)), sub(1))
        case 10 => // mid/side (§10.1.4): mid2 restores the dropped low bit
          val left = new Array[Int](blockSize)
          val right = new Array[Int](blockSize)
          var i = 0
          while (i < blockSize) {
            val side = sub(1)(i)
            val mid2 = (sub(0)(i).toLong << 1) | (side & 1L)
            left(i) = ((mid2 + side) >> 1).toInt
            right(i) = ((mid2 - side) >> 1).toInt
            i += 1
          }
          (left, right)
        case _ => (null, null)
      }
      if (l != null) { acc(0) ++= l; acc(1) ++= r }
      else {
        c = 0
        while (c < nCh) { acc(c) ++= sub(c); c += 1 }
      }
      collected += blockSize
      expectFrame += 1
    }
    if (info.totalSamples != 0 && collected != info.totalSamples)
      bad(s"collected $collected samples, STREAMINFO says ${info.totalSamples}")
    val samples = acc.map(_.result())
    val lim = 1 << (info.bps - 1)
    if (!samples.forall(_.forall(v => v >= -lim && v < lim)))
      bad("decoded sample exceeds declared bit depth")
    val gotMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(rawSampleBytes(samples, info.bps))
    if (!java.util.Arrays.equals(gotMd5, info.md5) &&
      info.md5.exists(_ != 0)) bad("STREAMINFO MD5 mismatch")
    Decoded(info.sampleRate, info.channels, info.bps, samples)
  }

  // ─────────────────────────────────────────────────────────────────
  // Query surface
  // ─────────────────────────────────────────────────────────────────

  /** The deterministic PCM the fixture encodes: channel `c`, frame `i`
    * of document `id` — integer-exact, so the oracle recomputes every
    * stat closed-form (mirrors [[Multimodal.syntheticWav]]'s contract,
    * but through the COMPRESSED path). */
  private[graft] def pcmAt(id: Long, c: Int, i: Int): Int =
    (((id * 131 + c * 997 + i * 17) % 4001) - 2000).toInt

  private[graft] def fixtureParams(id: Long): (Int, Int, Int) =
    ((8000 * (1 + id % 3)).toInt, (1 + id % 2).toInt, (150 + id % 111).toInt)

  /** Synthetic FLAC corpus derived deterministically from `documents`:
    * real RFC 9639 streams (any FLAC tool plays them), 1-2 channels,
    * small 64-sample blocks so every stream spans several frames and a
    * partial tail frame. */
  def syntheticFlac(spark: SparkSession, d: String): Dataset[AudioRecord] = {
    import spark.implicits._
    Tables.fanOut(Tables.documents(spark, d)
      .select(col("doc_id"))
      .as[Long])
      .map { id =>
        val (rate, ch, frames) = fixtureParams(id)
        val pcm = Array.tabulate(ch, frames)((c, i) => pcmAt(id, c, i))
        AudioRecord(id, encode(rate, 16, pcm, blockSize = 64,
          lpcOrder2 = id % 5 == 0))
      }
  }

  /** QM-FLAC — decode the compressed corpus scan-side and report
    * per-stream stats; `amp_sum` sums EVERY decoded sample across all
    * channels, so a hash match proves the whole codec chain (encoder
    * bitstream → CRC/MD5-verified decode → exact samples) end to end.
    * Corrupt payloads quarantine (dropped), same contract as the other
    * media rows. */
  def flacStats(audio: Dataset[AudioRecord]): DataFrame = {
    import audio.sparkSession.implicits._
    audio.mapPartitions(_.flatMap { r =>
      decode(r.payload).map { dec =>
        var sum = 0L
        for (ch <- dec.samples; v <- ch) sum += v
        (r.media_id, dec.sampleRate.toLong, dec.channels.toLong,
          dec.samples(0).length.toLong, sum,
          r.payload.length.toLong)
      }
    }).toDF("media_id", "sample_rate", "channels", "n_frames", "amp_sum",
      "n_bytes")
  }

  def qmFlacStats(spark: SparkSession, d: String): DataFrame = {
    val stats = flacStats(syntheticFlac(spark, d))
    // the byte size is real but not closed-form; certify compression
    // in-row (predictors must beat raw 16-bit PCM plus the 42-byte
    // stream header on every record), then drop the column so the
    // oracle stays exact
    import org.apache.spark.sql.functions.lit
    val blowups = stats.filter(col("n_bytes") >=
      col("n_frames") * col("channels") * lit(2L) + lit(64L)).count()
    require(blowups == 0, s"flac: $blowups streams larger than raw PCM")
    stats.drop("n_bytes").orderBy("media_id")
  }

  /** QM-FLAC-F — windowed FEATURE EXTRACTION over the COMPRESSED path
    * (the [[Multimodal.audioFeatures]] twin): per 64-frame window of
    * channel 0 of the CRC/MD5-verified FLAC decode, integer-exact
    * energy and zero-crossing count, partial tail window never padded.
    * A hash match proves decode → windowing → feature math through the
    * full codec chain, not just the plane sums. */
  def flacFeatures(audio: Dataset[AudioRecord], window: Int = 64): DataFrame = {
    import audio.sparkSession.implicits._
    audio.mapPartitions(_.flatMap { r =>
      decode(r.payload).toSeq.flatMap { dec =>
        val ch0 = dec.samples(0)
        val frames = ch0.length
        (0 until (frames + window - 1) / window).map { w =>
          val lo = w * window
          val hi = math.min(frames, lo + window)
          var energy = 0L
          var zc = 0L
          var f = lo
          while (f < hi) {
            val s = ch0(f).toLong
            energy += s * s
            if (f + 1 < hi && s * ch0(f + 1).toLong < 0) zc += 1
            f += 1
          }
          (r.media_id, w.toLong, (hi - lo).toLong, energy, zc)
        }
      }
    }).toDF("media_id", "win", "n_frames", "energy", "crossings")
  }

  def qmFlacFeatures(spark: SparkSession, d: String): DataFrame =
    flacFeatures(syntheticFlac(spark, d)).orderBy("media_id", "win")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qm_flac_stats" -> qmFlacStats _,
    "qm_flac_features" -> qmFlacFeatures _)

  val oracles: Map[String, String] = Map(
    "qm_flac_stats" ->
      ("SELECT doc_id AS media_id, " +
        "CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sample_rate, " +
        "CAST(1 + doc_id % 2 AS BIGINT) AS channels, " +
        "CAST(150 + doc_id % 111 AS BIGINT) AS n_frames, " +
        "CAST(list_sum(list_transform(range(0, CAST((1 + doc_id % 2) * " +
        "(150 + doc_id % 111) AS INT)), " +
        "k -> (doc_id*131 + (k // (150 + doc_id % 111))*997 + " +
        "(k % (150 + doc_id % 111))*17) % 4001 - 2000)) AS BIGINT) AS amp_sum " +
        "FROM documents ORDER BY media_id"),
    // channel 0 of the fixture formula (c = 0), windowed exactly as the
    // WAV features row — integer-exact in both engines
    "qm_flac_features" ->
      ("WITH d AS (SELECT doc_id AS id FROM documents), " +
        "a AS (SELECT id, 150 + id%111 AS frames FROM d), " +
        "w AS (SELECT id, frames, " +
        "unnest(range((frames + 63)//64))::BIGINT AS win FROM a) " +
        "SELECT id AS media_id, win, least(64, frames - win*64) AS n_frames, " +
        "CAST(list_sum(list_transform(range(win*64, least(frames, win*64+64)), " +
        "f -> ((id*131 + f*17) % 4001 - 2000) * ((id*131 + f*17) % 4001 - 2000))) AS BIGINT) AS energy, " +
        "CAST(COALESCE(list_sum(list_transform(range(win*64, least(frames, win*64+64) - 1), " +
        "f -> CASE WHEN ((id*131 + f*17) % 4001 - 2000) * ((id*131 + (f+1)*17) % 4001 - 2000) < 0 " +
        "THEN 1 ELSE 0 END)), 0) AS BIGINT) AS crossings " +
        "FROM w ORDER BY media_id, win"))
}
