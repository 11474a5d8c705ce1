package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Multimodal.VideoRecord

/** REAL inter-frame-format video: an MPEG-1 video elementary stream
  * codec (ISO/IEC 11172-2), pure JVM — this retires the last stub leg
  * of the multimodal surface (the old GRFT [[Multimodal.StubCodec]]
  * remains only as the opaque byte-plumbing fixture of
  * `qm_binary_stats`, no longer a codec stand-in).
  *
  * What is implemented, and the honest boundary of the subset:
  *  - The full INTRA decode path of the public spec: start-code parse
  *    (sequence header → GOP → picture → slices), macroblock address
  *    increment VLC (complete table B.1 + escape/stuffing), macroblock
  *    type for I-pictures (intra / intra+quant), the complete DC-size
  *    VLC tables (B.12 luma / B.13 chroma) with per-component DC
  *    prediction, AC run-level decode over the high-frequency subset of
  *    table B.5 that our encoder emits PLUS the full 20-bit escape
  *    range (escape coding is syntactically legal for every run/level,
  *    so every stream we write is spec-conformant), inverse zigzag,
  *    intra dequantization with the spec's oddification + saturation
  *    (§2.4.4.2), and a separable double-precision 8×8 IDCT.
  *  - The matching encoder (4:2:0, one slice per macroblock row,
  *    default quant matrices), I-frame and planted-motion P-frame.
  *  - P-pictures (forward prediction, §2.4.3.4 / §2.4.4.3): motion_code
  *    VLC (table B.4 — magnitude prefixes shared with B.1, sign bit
  *    appended), differential motion reconstruction with the f_code
  *    modulo wrap, full-pel and half-pel prediction (the spec's
  *    round-away "//" interpolation), chroma vectors halved toward
  *    zero, P macroblock types (table B.2b: pred-m/-c/-mc, their quant
  *    variants, intra), coded_block_pattern (table B.3 subset — our
  *    encoder emits only cbp 63; unknown codes quarantine), skipped
  *    macroblocks (co-located copy + predictor resets), non-intra
  *    dequantization with oddification + saturation, and a signed
  *    residual IDCT clamped to the spec's [-256, 255].
  *  - B-pictures (bidirectional MC, §2.4.4.4): dual forward/backward
  *    f_codes, macroblock types (table B.2c, all eleven rows on decode),
  *    independent forward/backward MV predictor chains (reset at slice
  *    start and intra MBs, UNCHANGED across skips — the B/P semantic
  *    split of §2.4.3.4), interpolated prediction with the spec's "//"
  *    averaging, B-skip = repeat the previous MB's prediction direction
  *    and vectors (previous MB shall not be intra), and display
  *    reordering by temporal_reference (anchors are decoded before the
  *    B-pictures that display before them; frames re-sort per GOP).
  *  - NOT implemented: D pictures. A stream containing them quarantines
  *    loudly (`decode` → None) — the same strict posture as every other
  *    codec here; an AC or CBP code outside the implemented table subset
  *    likewise answers None rather than misparse.
  *
  * Correctness anchors (the reason the corpus is built the way it is):
  * intra DC is quantized with a FIXED step of 8 (spec §2.4.4.1), so a
  * frame built from flat 16×16 macroblocks survives encode → decode
  * BIT-EXACT — quantization never rounds (DC of a flat block of value
  * v is exactly 8v; every AC coefficient is exactly 0). `qm_mpeg1_stats`
  * rides that: the DuckDB oracle recomputes every decoded plane sum
  * closed-form from the generator formula without seeing a byte, so a
  * hash match proves the entire bitstream round trip — header bits, VLC
  * tables, DC prediction chain, dequant, IDCT — is exact. The AC path
  * (run-level codes, escapes, oddification, zigzag) is exercised by
  * `qm_mpeg1_roundtrip` on textured frames, self-certifying the decoded
  * pixels against the in-plan reference within the quantization error
  * bound pinned by Mpeg1Spec.
  *
  * Scale posture: encode/decode are per-record scan-side byte work in
  * one `mapPartitions` pass — no shuffle, embarrassingly parallel, the
  * same shape as [[Multimodal.Y4mCodec]]. At 100 TB the only change
  * worth making is swapping the double IDCT for the AAN integer one;
  * the plan shape is already the right one.
  */
object Mpeg1 {

  // ── bit I/O ─────────────────────────────────────────────────────────

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream(1 << 12)
    private var acc = 0; private var nAcc = 0

    def writeBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1); nAcc += 1
        if (nAcc == 8) { buf.write(acc); acc = 0; nAcc = 0 }
        i -= 1
      }
    }
    /** code is a '0'/'1' string (VLC table entry). */
    def writeCode(code: String): Unit = {
      var i = 0
      while (i < code.length) { writeBits(if (code.charAt(i) == '1') 1 else 0, 1); i += 1 }
    }
    def byteAlign(): Unit = if (nAcc > 0) writeBits(0, 8 - nAcc)
    def startCode(code: Int): Unit = {
      byteAlign(); writeBits(0, 16); writeBits(1, 8); writeBits(code, 8)
    }
    def toBytes: Array[Byte] = { byteAlign(); buf.toByteArray }
  }

  /** Parse failure → quarantine the whole record: decode catches this
    * (and only this) and answers None. */
  private final class Bail extends RuntimeException(null, null, false, false)
  private def bail(): Nothing = throw new Bail

  private final class BitReader(p: Array[Byte]) {
    var pos = 0 // bit position

    def bitsLeft: Int = p.length * 8 - pos
    def read(n: Int): Int = {
      if (n > bitsLeft) bail()
      var v = 0; var i = 0
      while (i < n) {
        v = (v << 1) | ((p(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1; i += 1
      }
      v
    }
    def peek(n: Int): Int = { val saved = pos; val v = read(n); pos = saved; v }
    def byteAligned: Boolean = (pos & 7) == 0
    def byteAlign(): Unit = if (!byteAligned) { if (read(8 - (pos & 7)) != 0) bail() }

    /** True iff the padding bits to the next byte boundary are zero and
      * a start-code prefix (0x000001) sits at that boundary — the spec's
      * slice-termination condition for streams without stuffing. */
    def atStartCode: Boolean = {
      val pad = (8 - (pos & 7)) & 7
      if (pad + 24 > bitsLeft) return bitsLeft <= pad // clean EOF also ends the slice loop
      peek(pad + 24) == 1 // pad zeros + 0x000001
    }
    /** Align and consume a 0x000001 prefix, returning the code byte. */
    def nextStartCode(): Int = {
      byteAlign()
      if (read(24) != 1) bail()
      read(8)
    }
    def atEnd: Boolean = {
      val pad = (8 - (pos & 7)) & 7
      bitsLeft <= pad && (pad == 0 || peek(bitsLeft) == 0)
    }
  }

  // ── tables (public spec) ────────────────────────────────────────────

  /** Zigzag scan order (§2.4.4.1, Figure 2-D.1): zigzag(i) = raster
    * index of the i-th scanned coefficient. */
  val Zigzag: Array[Int] = Array(
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Default intra quantizer matrix (§2.4.2.3), raster order. */
  val IntraQuant: Array[Int] = Array(
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83)

  /** dct_dc_size_luminance (table B.12): size → code. */
  private val DcSizeLuma: Array[String] = Array(
    "100", "00", "01", "101", "110", "1110", "11110", "111110", "1111110")
  /** dct_dc_size_chrominance (table B.13). */
  private val DcSizeChroma: Array[String] = Array(
    "00", "01", "10", "110", "1110", "11110", "111110", "1111110", "11111110")

  /** macroblock_address_increment (table B.1): increment → code. */
  private val AddrInc: Array[String] = Array("", // 1-based
    "1", "011", "010", "0011", "0010", "00011", "00010", "0000111",
    "0000110", "00001011", "00001010", "00001001", "00001000", "00000111",
    "00000110", "0000010111", "0000010110", "0000010101", "0000010100",
    "0000010011", "0000010010", "00000100011", "00000100010", "00000100001",
    "00000100000", "00000011111", "00000011110", "00000011101", "00000011100",
    "00000011011", "00000011010", "00000011001", "00000011000")
  private val AddrEscape = "00000001000" // +33, may repeat
  private val AddrStuffing = "00000001111" // no-op padding

  /** dct_coeff_next (table B.5) — the (run, level) pairs our encoder
    * emits as VLC (sign bit appended); everything else goes through the
    * spec's escape coding, which is legal for any pair. Prefix-freeness
    * of the whole code space (with EOB '10' and escape '000001') is
    * pinned by Mpeg1Spec. */
  val AcCodes: Seq[(Int, Int, String)] = Seq(
    (0, 1, "11"), (1, 1, "011"), (0, 2, "0100"), (2, 1, "0101"),
    (0, 3, "00101"), (3, 1, "00111"), (4, 1, "00110"),
    (1, 2, "000110"), (5, 1, "000111"), (6, 1, "000101"), (7, 1, "000100"),
    (0, 4, "0000110"), (2, 2, "0000100"), (8, 1, "0000111"), (9, 1, "0000101"),
    (0, 5, "00100110"), (0, 6, "00100001"), (1, 3, "00100101"),
    (3, 2, "00100100"), (10, 1, "00100111"), (11, 1, "00100011"),
    (12, 1, "00100010"), (13, 1, "00100000"))
  private val Eob = "10"
  private val AcEscape = "000001"
  private val AcEncode: Map[(Int, Int), String] =
    AcCodes.map { case (r, l, c) => (r, l) -> c }.toMap

  /** Longest-first VLC decode helper: walk bits, matching against the
    * table; codes are short (≤ 11 bits here) so the linear walk is fine
    * for scan-side work. */
  private final class VlcDecoder[T](entries: Seq[(String, T)]) {
    private val byCode = entries.toMap
    private val maxLen = entries.iterator.map(_._1.length).max
    def decode(r: BitReader): T = {
      val sb = new java.lang.StringBuilder(maxLen)
      while (sb.length < maxLen) {
        sb.append(if (r.read(1) == 1) '1' else '0')
        byCode.get(sb.toString) match {
          case Some(t) => return t
          case None    =>
        }
      }
      bail()
    }
  }

  private val DcLumaDec = new VlcDecoder[Int](DcSizeLuma.zipWithIndex.map { case (c, s) => (c, s) })
  private val DcChromaDec = new VlcDecoder[Int](DcSizeChroma.zipWithIndex.map { case (c, s) => (c, s) })
  private val AddrDec = new VlcDecoder[Int](
    (1 to 33).map(i => (AddrInc(i), i)) :+ (AddrEscape, -1) :+ (AddrStuffing, -2))
  private sealed trait AcSym
  private case object AcEob extends AcSym
  private case object AcEsc extends AcSym
  private final case class AcRunLevel(run: Int, level: Int) extends AcSym
  private val AcDec = new VlcDecoder[AcSym](
    AcCodes.map { case (r, l, c) => (c, AcRunLevel(r, l): AcSym) } :+
      (Eob, AcEob: AcSym) :+ (AcEscape, AcEsc: AcSym))

  /** motion_code magnitude prefixes (table B.4). B.4 shares its prefix
    * family with B.1: the code for magnitude m is the common prefix of
    * the B.1 codes for increments 2m and 2m+1, followed by one sign bit
    * (0 = positive); motion_code 0 is '1'. Derived rather than
    * transcribed so the two tables cannot drift apart. */
  private[graft] val MotionPrefix: Array[String] = {
    val t = new Array[String](17)
    var m = 1
    while (m <= 16) {
      val a = AddrInc(2 * m); val b = AddrInc(2 * m + 1)
      var i = 0
      while (i < a.length && i < b.length && a.charAt(i) == b.charAt(i)) i += 1
      t(m) = a.substring(0, i)
      m += 1
    }
    t
  }
  private[graft] def motionCodes: Seq[String] =
    "1" +: (1 to 16).flatMap(m => Seq(MotionPrefix(m) + "0", MotionPrefix(m) + "1"))
  private val MotionDec = new VlcDecoder[Int](
    ("1" -> 0) +: (1 to 16).flatMap(m =>
      Seq((MotionPrefix(m) + "0") -> m, (MotionPrefix(m) + "1") -> -m)))

  /** macroblock_type for P-pictures (table B.2b):
    * (quant, motion_forward, pattern, intra). */
  private[graft] val PMbTypes: Seq[(String, (Boolean, Boolean, Boolean, Boolean))] = Seq(
    "1"      -> ((false, true, true, false)),  // pred-mc
    "01"     -> ((false, false, true, false)), // pred-c
    "001"    -> ((false, true, false, false)), // pred-m
    "00011"  -> ((false, false, false, true)), // intra
    "00010"  -> ((true, true, true, false)),   // pred-mcq
    "00001"  -> ((true, false, true, false)),  // pred-cq
    "000001" -> ((true, false, false, true)))  // intra-q
  private val PMbTypeDec = new VlcDecoder[(Boolean, Boolean, Boolean, Boolean)](PMbTypes)

  /** macroblock_type for B-pictures (table B.2c):
    * (quant, motion_forward, motion_backward, pattern, intra). */
  private[graft] val BMbTypes: Seq[(String, (Boolean, Boolean, Boolean, Boolean, Boolean))] = Seq(
    "10"     -> ((false, true, true, false, false)),  // interp
    "11"     -> ((false, true, true, true, false)),   // interp-c
    "010"    -> ((false, false, true, false, false)), // bwd
    "011"    -> ((false, false, true, true, false)),  // bwd-c
    "0010"   -> ((false, true, false, false, false)), // fwd
    "0011"   -> ((false, true, false, true, false)),  // fwd-c
    "00011"  -> ((false, false, false, false, true)), // intra
    "00010"  -> ((true, true, true, true, false)),    // interp-cq
    "000011" -> ((true, true, false, true, false)),   // fwd-cq
    "000010" -> ((true, false, true, true, false)),   // bwd-cq
    "000001" -> ((true, false, false, false, true)))  // intra-q
  private val BMbTypeDec =
    new VlcDecoder[(Boolean, Boolean, Boolean, Boolean, Boolean)](BMbTypes)

  /** coded_block_pattern (table B.3), the ≤6-bit rows — the complete
    * subset our encoder can emit (it only ever writes cbp 63) plus the
    * common single/dual-block patterns for hand-built test streams. A
    * cbp code outside this subset quarantines, the same posture as the
    * AC-table subset. Bit 5-i of the value flags block i coded, block
    * order Y0 Y1 Y2 Y3 Cb Cr (§2.4.3.6). */
  private[graft] val CbpCodes: Seq[(Int, String)] = Seq(
    60 -> "111", 4 -> "1101", 8 -> "1100", 16 -> "1011", 32 -> "1010",
    12 -> "10011", 48 -> "10010", 20 -> "10001", 40 -> "10000",
    28 -> "01111", 44 -> "01110", 52 -> "01101", 56 -> "01100",
    1 -> "01011", 61 -> "01010", 2 -> "01001", 62 -> "01000",
    24 -> "001111", 36 -> "001110", 3 -> "001101", 63 -> "001100")
  private val CbpDec = new VlcDecoder[Int](CbpCodes.map { case (v, c) => (c, v) })
  private val CbpEncode: Map[Int, String] = CbpCodes.toMap

  // ── DCT ─────────────────────────────────────────────────────────────

  private val CosTab: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) { t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0); u += 1 }
      x += 1
    }
    t
  }
  private val C0 = 1.0 / math.sqrt(2.0)

  /** Forward 8×8 DCT, spec normalization: F(0,0) of a flat block of
    * value v is exactly 8v (up to ~1e-13 float noise, below the DC
    * quantizer's rounding). */
  def fdct(block: Array[Int]): Array[Double] = {
    val tmp = new Array[Double](64) // rows transformed
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < 8) { s += block(y * 8 + x) * CosTab(x * 8 + u); x += 1 }
        tmp(y * 8 + u) = s * (if (u == 0) C0 else 1.0)
        u += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0; var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * CosTab(yy * 8 + v); yy += 1 }
        out(v * 8 + u) = 0.25 * s * (if (v == 0) C0 else 1.0)
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse 8×8 DCT → clamped 0..255 samples (intra: no predictor). */
  def idct(coef: Array[Int]): Array[Int] = idctClamped(coef, 0, 255)

  /** Inverse 8×8 DCT for non-intra residual blocks: signed output,
    * clamped to the spec's [-256, 255] (§2.4.4.3) — the final 0..255
    * clamp happens after the prediction is added. */
  def idctSigned(coef: Array[Int]): Array[Int] = idctClamped(coef, -256, 255)

  /** One copy of the separable IDCT butterfly — the intra and
    * non-intra paths differ only in their output clamp. */
  private def idctClamped(coef: Array[Int], lo: Int, hi: Int): Array[Int] = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += (if (u == 0) C0 else 1.0) * coef(v * 8 + u) * CosTab(x * 8 + u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var vv = 0
        while (vv < 8) { s += (if (vv == 0) C0 else 1.0) * tmp(vv * 8 + x) * CosTab(y * 8 + vv); vv += 1 }
        val p = math.round(0.25 * s).toInt
        out(y * 8 + x) = if (p < lo) lo else if (p > hi) hi else p
        x += 1
      }
      y += 1
    }
    out
  }

  // ── codec ───────────────────────────────────────────────────────────

  /** One decoded/source frame: planar 4:2:0, values 0..255.
    * y is w×h; cb/cr are (w/2)×(h/2). */
  final case class Frame(y: Array[Int], cb: Array[Int], cr: Array[Int])
  final case class Decoded(width: Int, height: Int, frames: Seq[Frame])

  /** One picture to encode. [[IPic]] carries full pixel content;
    * [[PPic]] carries per-macroblock coding decisions (the planted
    * motion the closed-form oracle rides). */
  sealed trait Pic { def qscale: Int }
  final case class IPic(qscale: Int, frame: Frame) extends Pic

  /** P-picture: `mvx`/`mvy` are in vector units (full pels when the
    * picture's `fullPel` flag is set, half pels otherwise); `fCode`
    * bounds the differential range the spec way ([-16f, 16f-1],
    * f = 2^(fCode-1)). */
  final case class PPic(qscale: Int, fullPel: Boolean, fCode: Int, mbs: Seq[MbCode]) extends Pic

  /** B-picture: bidirectional prediction from the two surrounding
    * anchors (decode order puts both anchors first; the encoder assigns
    * temporal references so the stream displays I B… P, not I P B…).
    * Each direction carries its own full_pel flag and f_code. */
  final case class BPic(qscale: Int, fullPelFwd: Boolean, fCodeFwd: Int,
                        fullPelBwd: Boolean, fCodeBwd: Int, mbs: Seq[BMb]) extends Pic

  sealed trait BMb
  /** Skipped B macroblock: repeats the previous macroblock's prediction
    * direction and motion vectors (§2.4.3.4 — NOT a co-located copy and
    * NOT a predictor reset, the two ways B-skip differs from P-skip).
    * Illegal first/last in a slice or after an intra macroblock. */
  case object BSkip extends BMb
  /** Predicted B macroblock: at least one direction must be present;
    * both → interpolated. `deltas` = flat per-plane residuals → cbp 63. */
  final case class BPred(fwd: Option[(Int, Int)], bwd: Option[(Int, Int)],
                         deltas: Option[(Int, Int, Int)]) extends BMb
  /** Intra macroblock inside a B-picture (resets both MV predictors). */
  final case class BIntra(y: Array[Int], cb: Array[Int], cr: Array[Int]) extends BMb

  sealed trait MbCode
  /** Skipped macroblock: co-located copy from the reference. Illegal as
    * the first or last macroblock of a slice (§2.4.3.4). */
  case object MbSkip extends MbCode
  /** Forward-predicted macroblock. `deltas` = flat per-plane residuals
    * (each nonzero) → pred-mc with cbp 63; None → pred-m (motion only). */
  final case class MbPred(mvx: Int, mvy: Int, deltas: Option[(Int, Int, Int)]) extends MbCode
  /** Intra macroblock inside a P-picture: 16×16 luma + 8×8 chroma,
    * raster order. */
  final case class MbIntra(y: Array[Int], cb: Array[Int], cr: Array[Int]) extends MbCode

  object Mpeg1Codec {

    /** Encode an I-frame-only MPEG-1 video elementary stream. Dims must
      * be multiples of 16 (the spec pads arbitrary dims up to the
      * macroblock grid; our synthetic corpora generate aligned dims so
      * the closed-form oracle needs no crop arithmetic). */
    def encode(w: Int, h: Int, qscale: Int, frames: Seq[Frame]): Array[Byte] =
      encodeSeq(w, h, frames.map(IPic(qscale, _)))

    /** Encode a mixed I/P sequence. The bitstream for an all-I sequence
      * is byte-identical to the historical I-only encoder (the golden
      * rows `qm_mpeg1_stats` / `qm_mpeg1_roundtrip` ride that). */
    def encodeSeq(w: Int, h: Int, pics: Seq[Pic]): Array[Byte] = {
      require(w % 16 == 0 && h % 16 == 0 && w > 0 && h > 0, s"dims must be multiples of 16: ${w}x$h")
      pics.foreach(p => require(p.qscale >= 1 && p.qscale <= 31, s"quantizer_scale in [1,31]: ${p.qscale}"))
      require(pics.nonEmpty && pics.head.isInstanceOf[IPic], "sequence must open with an I-picture")
      locally { // a B-picture needs both its anchors already coded
        var anchors = 0
        pics.foreach {
          case _: BPic => require(anchors >= 2, "a B-picture must follow at least two anchor pictures (its forward and backward references)")
          case _       => anchors += 1
        }
      }
      // temporal_reference = DISPLAY index: pics arrive in decode order
      // (each anchor precedes the B-pictures that display before it), so
      // an anchor followed by n B-pictures takes display slot disp+n and
      // the B-run takes disp .. disp+n-1
      val tref: Array[Int] = {
        val t = new Array[Int](pics.length)
        var disp = 0; var i = 0
        while (i < pics.length) {
          var j = i + 1
          while (j < pics.length && pics(j).isInstanceOf[BPic]) j += 1
          val nB = j - i - 1
          t(i) = disp + nB
          var k = 0
          while (k < nB) { t(i + 1 + k) = disp + k; k += 1 }
          disp += nB + 1
          i = j
        }
        t
      }
      val mbw = w / 16; val mbh = h / 16
      val bw = new BitWriter

      // sequence_header (§2.4.2.3)
      bw.startCode(0xB3)
      bw.writeBits(w, 12); bw.writeBits(h, 12)
      bw.writeBits(1, 4)       // pel_aspect_ratio: square
      bw.writeBits(3, 4)       // picture_rate: 25 fps
      bw.writeBits(0x3FFFF, 18) // bit_rate: variable
      bw.writeBits(1, 1)       // marker
      bw.writeBits(0, 10)      // vbv_buffer_size
      bw.writeBits(0, 1)       // constrained_parameters_flag
      bw.writeBits(0, 1); bw.writeBits(0, 1) // default quant matrices

      // group_of_pictures header
      bw.startCode(0xB8)
      bw.writeBits(0, 1); bw.writeBits(0, 5); bw.writeBits(0, 6) // drop, hours, minutes
      bw.writeBits(1, 1)                                         // marker
      bw.writeBits(0, 6); bw.writeBits(0, 6)                     // seconds, pictures
      bw.writeBits(1, 1); bw.writeBits(0, 1)                     // closed_gop, broken_link

      pics.zipWithIndex.foreach {
        case (IPic(qscale, fr), f) =>
          require(fr.y.length == w * h && fr.cb.length == w * h / 4 && fr.cr.length == w * h / 4,
            "planar 4:2:0 payload sizes must match the declared dims")
          bw.startCode(0x00) // picture_start_code
          bw.writeBits(tref(f) & 0x3FF, 10) // temporal_reference (display order)
          bw.writeBits(1, 3)          // picture_coding_type: I
          bw.writeBits(0xFFFF, 16)    // vbv_delay: variable
          bw.writeBits(0, 1)          // extra_bit_picture

          var row = 0
          while (row < mbh) {
            bw.startCode(row + 1) // slice_start_code: vertical position, 1-based
            bw.writeBits(qscale, 5)
            bw.writeBits(0, 1) // extra_bit_slice
            var predY = 128; var predCb = 128; var predCr = 128
            var mx = 0
            while (mx < mbw) {
              bw.writeCode(AddrInc(1)) // consecutive macroblocks
              bw.writeCode("1")        // macroblock_type: intra
              // 4 luma blocks (2×2 raster inside the MB), then Cb, Cr
              var b = 0
              while (b < 4) {
                val ox = mx * 16 + (b % 2) * 8; val oy = row * 16 + (b / 2) * 8
                val blk = new Array[Int](64)
                var i = 0
                while (i < 64) { blk(i) = fr.y((oy + i / 8) * w + ox + i % 8); i += 1 }
                predY = encodeBlock(bw, blk, qscale, predY, luma = true)
                b += 1
              }
              val cw = w / 2
              val cblk = new Array[Int](64); val rblk = new Array[Int](64)
              var i = 0
              while (i < 64) {
                val cy = row * 8 + i / 8; val cx = mx * 8 + i % 8
                cblk(i) = fr.cb(cy * cw + cx); rblk(i) = fr.cr(cy * cw + cx)
                i += 1
              }
              predCb = encodeBlock(bw, cblk, qscale, predCb, luma = false)
              predCr = encodeBlock(bw, rblk, qscale, predCr, luma = false)
              mx += 1
            }
            row += 1
          }

        case (PPic(qscale, fullPel, fCode, mbs), f) =>
          require(fCode >= 1 && fCode <= 7, s"forward_f_code in [1,7]: $fCode")
          require(mbs.length == mbw * mbh, s"need ${mbw * mbh} macroblock codes, got ${mbs.length}")
          val fSize = 1 << (fCode - 1); val rSize = fCode - 1
          bw.startCode(0x00)
          bw.writeBits(tref(f) & 0x3FF, 10)
          bw.writeBits(2, 3)          // picture_coding_type: P
          bw.writeBits(0xFFFF, 16)    // vbv_delay
          bw.writeBits(if (fullPel) 1 else 0, 1) // full_pel_forward_vector
          bw.writeBits(fCode, 3)      // forward_f_code
          bw.writeBits(0, 1)          // extra_bit_picture

          var row = 0
          while (row < mbh) {
            bw.startCode(row + 1)
            bw.writeBits(qscale, 5)
            bw.writeBits(0, 1)
            var predY = 128; var predCb = 128; var predCr = 128
            var mvPx = 0; var mvPy = 0
            var pendInc = 1
            var mx = 0
            while (mx < mbw) {
              mbs(row * mbw + mx) match {
                case MbSkip =>
                  require(mx != 0 && mx != mbw - 1,
                    "the first/last macroblock of a slice shall not be skipped (§2.4.3.4)")
                  pendInc += 1
                  // skipped MB: decoder resets both predictor chains
                  mvPx = 0; mvPy = 0; predY = 128; predCb = 128; predCr = 128

                case MbPred(mvx, mvy, deltas) =>
                  writeAddrInc(bw, pendInc); pendInc = 1
                  bw.writeCode(if (deltas.isDefined) "1" else "001") // B.2b: pred-mc / pred-m
                  mvPx = writeMv(bw, mvPx, mvx, fSize, rSize)
                  mvPy = writeMv(bw, mvPy, mvy, fSize, rSize)
                  deltas.foreach { case (dy, dcb, dcr) =>
                    bw.writeCode(CbpEncode(63)) // all six blocks coded
                    var b = 0
                    while (b < 4) { writeFlatResidual(bw, dy, qscale); b += 1 }
                    writeFlatResidual(bw, dcb, qscale)
                    writeFlatResidual(bw, dcr, qscale)
                  }
                  predY = 128; predCb = 128; predCr = 128 // DC preds reset at non-intra MBs

                case MbIntra(yb, cbb, crb) =>
                  require(yb.length == 256 && cbb.length == 64 && crb.length == 64,
                    "intra MB payload must be 16×16 luma + 8×8 chroma")
                  writeAddrInc(bw, pendInc); pendInc = 1
                  bw.writeCode("00011") // B.2b: intra
                  var b = 0
                  while (b < 4) {
                    val ox = (b % 2) * 8; val oy = (b / 2) * 8
                    val blk = new Array[Int](64)
                    var i = 0
                    while (i < 64) { blk(i) = yb((oy + i / 8) * 16 + ox + i % 8); i += 1 }
                    predY = encodeBlock(bw, blk, qscale, predY, luma = true)
                    b += 1
                  }
                  predCb = encodeBlock(bw, cbb, qscale, predCb, luma = false)
                  predCr = encodeBlock(bw, crb, qscale, predCr, luma = false)
                  mvPx = 0; mvPy = 0 // intra MB resets the MV predictor
              }
              mx += 1
            }
            row += 1
          }

        case (BPic(qscale, fpF, fcF, fpB, fcB, mbs), f) =>
          require(fcF >= 1 && fcF <= 7 && fcB >= 1 && fcB <= 7,
            s"f_codes in [1,7]: fwd $fcF bwd $fcB")
          require(mbs.length == mbw * mbh, s"need ${mbw * mbh} macroblock codes, got ${mbs.length}")
          val fsF = 1 << (fcF - 1); val rsF = fcF - 1
          val fsB = 1 << (fcB - 1); val rsB = fcB - 1
          bw.startCode(0x00)
          bw.writeBits(tref(f) & 0x3FF, 10)
          bw.writeBits(3, 3)          // picture_coding_type: B
          bw.writeBits(0xFFFF, 16)    // vbv_delay
          bw.writeBits(if (fpF) 1 else 0, 1); bw.writeBits(fcF, 3)
          bw.writeBits(if (fpB) 1 else 0, 1); bw.writeBits(fcB, 3)
          bw.writeBits(0, 1)          // extra_bit_picture

          var row = 0
          while (row < mbh) {
            bw.startCode(row + 1)
            bw.writeBits(qscale, 5)
            bw.writeBits(0, 1)
            var predY = 128; var predCb = 128; var predCr = 128
            var fmx = 0; var fmy = 0; var bmx = 0; var bmy = 0
            var lastIntra = false
            var pendInc = 1
            var mx = 0
            while (mx < mbw) {
              mbs(row * mbw + mx) match {
                case BSkip =>
                  require(mx != 0 && mx != mbw - 1,
                    "the first/last macroblock of a slice shall not be skipped (§2.4.3.4)")
                  require(!lastIntra,
                    "a skipped B macroblock shall not follow an intra macroblock (§2.4.3.4)")
                  pendInc += 1
                  // B-skip: MV predictors UNCHANGED; DC preds reset
                  predY = 128; predCb = 128; predCr = 128

                case BPred(fwd, bwd, deltas) =>
                  require(fwd.isDefined || bwd.isDefined,
                    "a predicted B macroblock needs at least one direction")
                  writeAddrInc(bw, pendInc); pendInc = 1
                  bw.writeCode((fwd.isDefined, bwd.isDefined, deltas.isDefined) match {
                    case (true, true, false)  => "10"   // interp
                    case (true, true, true)   => "11"   // interp-c
                    case (false, true, false) => "010"  // bwd
                    case (false, true, true)  => "011"  // bwd-c
                    case (true, false, false) => "0010" // fwd
                    case (true, false, true)  => "0011" // fwd-c
                    case _                    => throw new IllegalStateException("unreachable")
                  })
                  fwd.foreach { case (x, y0) =>
                    fmx = writeMv(bw, fmx, x, fsF, rsF); fmy = writeMv(bw, fmy, y0, fsF, rsF)
                  }
                  bwd.foreach { case (x, y0) =>
                    bmx = writeMv(bw, bmx, x, fsB, rsB); bmy = writeMv(bw, bmy, y0, fsB, rsB)
                  }
                  deltas.foreach { case (dy, dcb, dcr) =>
                    bw.writeCode(CbpEncode(63))
                    var b = 0
                    while (b < 4) { writeFlatResidual(bw, dy, qscale); b += 1 }
                    writeFlatResidual(bw, dcb, qscale)
                    writeFlatResidual(bw, dcr, qscale)
                  }
                  predY = 128; predCb = 128; predCr = 128
                  lastIntra = false
                  // an uncoded direction's predictor is UNCHANGED in B

                case BIntra(yb, cbb, crb) =>
                  require(yb.length == 256 && cbb.length == 64 && crb.length == 64,
                    "intra MB payload must be 16×16 luma + 8×8 chroma")
                  writeAddrInc(bw, pendInc); pendInc = 1
                  bw.writeCode("00011") // B.2c: intra
                  var b = 0
                  while (b < 4) {
                    val ox = (b % 2) * 8; val oy = (b / 2) * 8
                    val blk = new Array[Int](64)
                    var i = 0
                    while (i < 64) { blk(i) = yb((oy + i / 8) * 16 + ox + i % 8); i += 1 }
                    predY = encodeBlock(bw, blk, qscale, predY, luma = true)
                    b += 1
                  }
                  predCb = encodeBlock(bw, cbb, qscale, predCb, luma = false)
                  predCr = encodeBlock(bw, crb, qscale, predCr, luma = false)
                  fmx = 0; fmy = 0; bmx = 0; bmy = 0 // intra resets BOTH MV predictors
                  lastIntra = true
              }
              mx += 1
            }
            row += 1
          }
      }
      bw.startCode(0xB7) // sequence_end_code
      bw.toBytes
    }

    private def writeAddrInc(bw: BitWriter, inc0: Int): Unit = {
      var inc = inc0
      while (inc > 33) { bw.writeCode(AddrEscape); inc -= 33 }
      bw.writeCode(AddrInc(inc))
    }

    /** Differential motion write (§2.4.3.4 inverted): wrap the delta
      * into [-16f, 16f-1], emit motion_code + residual. Returns the
      * reconstructed vector (= target; the decoder's wrap restores it). */
    private def writeMv(bw: BitWriter, pred: Int, target: Int, fSize: Int, rSize: Int): Int = {
      require(target >= -16 * fSize && target <= 16 * fSize - 1,
        s"motion vector $target outside the f_code range [-${16 * fSize}, ${16 * fSize - 1}]")
      var d = target - pred
      if (d > 16 * fSize - 1) d -= 32 * fSize
      if (d < -16 * fSize) d += 32 * fSize
      if (d == 0) bw.writeCode("1")
      else {
        val a = math.abs(d)
        val mc = (a - 1) / fSize + 1
        val res = (a - 1) % fSize
        require(mc <= 16, s"motion delta $d exceeds the codable range at f_code ${rSize + 1}")
        bw.writeCode(MotionPrefix(mc)); bw.writeBits(if (d < 0) 1 else 0, 1)
        if (rSize > 0) bw.writeBits(res, rSize)
      }
      target
    }

    /** Emit one coded non-intra block whose residual is flat `d` over
      * all 64 samples: DC-only, level = round(4d/q) (the inverse of the
      * non-intra dequant (2·level±1)·q with W=16), then EOB. At q=2 the
      * reconstruction is exact for any integer d — the property the
      * closed-form P-frame oracle rides. */
    private def writeFlatResidual(bw: BitWriter, d: Int, qscale: Int): Unit = {
      val l0 = math.round(4.0 * d / qscale).toInt
      val level = if (l0 < -255) -255 else if (l0 > 255) 255 else l0
      require(level != 0, s"flat residual $d vanishes at qscale $qscale — a coded block needs a coefficient")
      // dct_coeff_first: (0, ±1) is '1'+s; other pairs share B.5 with next
      if (math.abs(level) == 1) { bw.writeCode("1"); bw.writeBits(if (level < 0) 1 else 0, 1) }
      else AcEncode.get((0, math.abs(level))) match {
        case Some(code) =>
          bw.writeCode(code); bw.writeBits(if (level < 0) 1 else 0, 1)
        case None =>
          bw.writeCode(AcEscape); bw.writeBits(0, 6)
          if (level >= -127 && level <= 127) bw.writeBits(level & 0xFF, 8)
          else if (level > 0) { bw.writeBits(0, 8); bw.writeBits(level, 8) }
          else { bw.writeBits(0x80, 8); bw.writeBits(level + 256, 8) }
      }
      bw.writeCode(Eob)
    }

    /** DCT → quantize → DC-diff + AC run-level emit. Returns the new DC
      * predictor (quantized-DC scale, init 128 per slice). */
    private def encodeBlock(bw: BitWriter, blk: Array[Int], qscale: Int,
                            pred: Int, luma: Boolean): Int = {
      val f = fdct(blk)
      // intra DC: fixed step 8 (§2.4.4.1) — exact for flat blocks
      val qdc0 = math.round(f(0) / 8.0).toInt
      val qdc = if (qdc0 < 0) 0 else if (qdc0 > 255) 255 else qdc0
      val diff = qdc - pred
      val size = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      bw.writeCode(if (luma) DcSizeLuma(size) else DcSizeChroma(size))
      if (size > 0) {
        val bits = if (diff > 0) diff else diff + (1 << size) - 1
        bw.writeBits(bits, size)
      }
      // AC in zigzag order: level = round(8F / (qscale·W)), the inverse
      // of the decoder's (2·level·qscale·W)/16
      var run = 0; var zz = 1
      while (zz < 64) {
        val w = IntraQuant(Zigzag(zz))
        val l0 = math.round(8.0 * f(Zigzag(zz)) / (qscale * w)).toInt
        val level = if (l0 < -255) -255 else if (l0 > 255) 255 else l0
        if (level == 0) run += 1
        else {
          AcEncode.get((run, math.abs(level))) match {
            case Some(code) =>
              bw.writeCode(code); bw.writeBits(if (level < 0) 1 else 0, 1)
            case None =>
              bw.writeCode(AcEscape); bw.writeBits(run, 6)
              if (level >= -127 && level <= 127) bw.writeBits(level & 0xFF, 8)
              else if (level > 0) { bw.writeBits(0, 8); bw.writeBits(level, 8) }
              else { bw.writeBits(0x80, 8); bw.writeBits(level + 256, 8) }
          }
          run = 0
        }
        zz += 1
      }
      bw.writeCode(Eob)
      qdc
    }

    /** Strict decode: any malformed structure — bad start code, a VLC
      * outside the tables, a P/B picture, coefficients past 63, a
      * truncated stream — answers None for the whole record. */
    def decode(payload: Array[Byte]): Option[Decoded] =
      try { Some(decodeOrBail(payload)) } catch { case _: Bail => None }

    private def decodeOrBail(p: Array[Byte]): Decoded = {
      val r = new BitReader(p)
      if (r.nextStartCode() != 0xB3) bail()
      val w = r.read(12); val h = r.read(12)
      if (w <= 0 || h <= 0 || w % 16 != 0 || h % 16 != 0 || w > 4096 || h > 4096) bail()
      r.read(4); r.read(4); r.read(18)
      if (r.read(1) != 1) bail() // marker
      r.read(10); r.read(1)
      if (r.read(1) == 1) { var i = 0; while (i < 64) { r.read(8); i += 1 } } // load intra matrix: skip (defaults used by our encoder)
      if (r.read(1) == 1) { var i = 0; while (i < 64) { r.read(8); i += 1 } }
      val mbw = w / 16; val mbh = h / 16

      val frames = Seq.newBuilder[Frame]
      // Display reorder: pictures arrive in decode order (anchors before
      // the B-pictures that display before them); temporal_reference is
      // the display index within the GOP. Buffer a GOP, flush sorted.
      val gop = scala.collection.mutable.ArrayBuffer.empty[(Int, Frame)]
      def flushGop(): Unit = if (gop.nonEmpty) {
        val sorted = gop.sortBy(_._1)
        var i = 0
        while (i < sorted.length) { if (sorted(i)._1 != i) bail(); i += 1 } // must be a permutation of 0..n-1
        sorted.foreach(frames += _._2)
        gop.clear()
      }
      var anchorOld: Frame = null // a B-picture's forward (past) reference
      var anchorNew: Frame = null // a P-picture's reference; a B's backward
      var code = r.nextStartCode()
      while (code != 0xB7) {
        code match {
          case 0xB8 => // GOP header: parse + discard
            flushGop()
            r.read(25); r.read(1); r.read(1)
            code = r.nextStartCode()
          case 0x00 => // picture
            val tref = r.read(10)
            val ptype = r.read(3)
            if (ptype < 1 || ptype > 3) bail() // D pictures quarantine
            r.read(16) // vbv_delay
            var fullPelF = false; var fSizeF = 1; var rSizeF = 0
            var fullPelB = false; var fSizeB = 1; var rSizeB = 0
            if (ptype >= 2) {
              fullPelF = r.read(1) == 1
              val fCode = r.read(3); if (fCode == 0) bail()
              rSizeF = fCode - 1; fSizeF = 1 << rSizeF
            }
            if (ptype == 3) {
              fullPelB = r.read(1) == 1
              val fCode = r.read(3); if (fCode == 0) bail()
              rSizeB = fCode - 1; fSizeB = 1 << rSizeB
            }
            while (r.read(1) == 1) r.read(8) // extra_information_picture
            if (ptype == 2 && anchorNew == null) bail() // P needs a reference
            if (ptype == 3 && anchorOld == null) bail() // B needs both anchors
            val y = new Array[Int](w * h)
            val cb = new Array[Int](w * h / 4); val cr = new Array[Int](w * h / 4)
            val cw = w / 2
            var sc = r.nextStartCode()
            var nextRow = 0 // subset contract: one full slice per MB row, in order
            // slices of this picture
            while (sc >= 0x01 && sc <= 0xAF) {
              val row = sc - 1
              if (row >= mbh || row != nextRow) bail()
              nextRow += 1
              val qscale = r.read(5)
              if (qscale == 0) bail()
              while (r.read(1) == 1) r.read(8) // extra_information_slice
              var q = qscale
              var predY = 128; var predCb = 128; var predCr = 128
              var mvPx = 0; var mvPy = 0 // forward MV predictor, vector units
              var bmvPx = 0; var bmvPy = 0 // backward MV predictor (B only)
              var lastIntra = false // B-skip legality + direction repeat
              var lastFwd = false; var lastBwd = false
              var mbAddr = -1 // within the row
              while (!r.atStartCode) {
                var inc = 0
                var cont = true
                while (cont) {
                  AddrDec.decode(r) match {
                    case -2 => // stuffing
                    case -1 => inc += 33
                    case n  => inc += n; cont = false
                  }
                }
                if (ptype == 1) {
                  if (inc != 1) bail() // skipped MBs are illegal in I-pictures (§2.4.3.4)
                } else if (inc != 1) {
                  if (mbAddr == -1) bail() // the first MB of a slice shall not be skipped
                  if (mbAddr + inc >= mbw) bail()
                  if (ptype == 2) {
                    // P-skip: co-located copy, both predictor chains reset
                    var s = 1
                    while (s < inc) {
                      val a = mbAddr + s
                      copyBlock(anchorNew.y, y, w, a * 16, row * 16, 16, 16)
                      copyBlock(anchorNew.cb, cb, cw, a * 8, row * 8, 8, 8)
                      copyBlock(anchorNew.cr, cr, cw, a * 8, row * 8, 8, 8)
                      s += 1
                    }
                    mvPx = 0; mvPy = 0; predY = 128; predCb = 128; predCr = 128
                  } else {
                    // B-skip: repeat the previous MB's prediction direction
                    // with the UNCHANGED MV predictors (§2.4.3.4); the
                    // previous MB shall not be intra
                    if (lastIntra) bail()
                    val dfx = if (fullPelF) mvPx * 2 else mvPx
                    val dfy = if (fullPelF) mvPy * 2 else mvPy
                    val dbx = if (fullPelB) bmvPx * 2 else bmvPx
                    val dby = if (fullPelB) bmvPy * 2 else bmvPy
                    var s = 1
                    while (s < inc) {
                      val a = mbAddr + s
                      val (py16, pcb8, pcr8) = bPredict(anchorOld, anchorNew,
                        lastFwd, lastBwd, w, h, a, row, dfx, dfy, dbx, dby)
                      storeMb(y, cb, cr, w, a, row, py16, pcb8, pcr8,
                        NoResY, null, null)
                      s += 1
                    }
                    predY = 128; predCb = 128; predCr = 128
                  }
                }
                mbAddr += inc
                if (mbAddr >= mbw) bail()

                // macroblock_type
                var mQuant = false; var mMotionF = false; var mMotionB = false
                var mPattern = false; var mIntra = false
                if (ptype == 1) {
                  // I-picture: 1 = intra, 01 = intra+quant
                  mIntra = true
                  if (r.read(1) == 0) {
                    if (r.read(1) != 1) bail()
                    mQuant = true
                  }
                } else if (ptype == 2) {
                  val t = PMbTypeDec.decode(r)
                  mQuant = t._1; mMotionF = t._2; mPattern = t._3; mIntra = t._4
                } else {
                  val t = BMbTypeDec.decode(r)
                  mQuant = t._1; mMotionF = t._2; mMotionB = t._3; mPattern = t._4; mIntra = t._5
                }
                if (mQuant) { q = r.read(5); if (q == 0) bail() }
                if (mMotionF) {
                  val mcx = MotionDec.decode(r)
                  val rx = if (rSizeF > 0 && mcx != 0) r.read(rSizeF) else 0
                  mvPx = reconMv(mvPx, mcx, rx, fSizeF)
                  val mcy = MotionDec.decode(r)
                  val ry = if (rSizeF > 0 && mcy != 0) r.read(rSizeF) else 0
                  mvPy = reconMv(mvPy, mcy, ry, fSizeF)
                } else if (ptype == 2) {
                  mvPx = 0; mvPy = 0 // pred-c and intra MBs reset the predictor; MV = 0
                }
                if (mMotionB) {
                  val mcx = MotionDec.decode(r)
                  val rx = if (rSizeB > 0 && mcx != 0) r.read(rSizeB) else 0
                  bmvPx = reconMv(bmvPx, mcx, rx, fSizeB)
                  val mcy = MotionDec.decode(r)
                  val ry = if (rSizeB > 0 && mcy != 0) r.read(rSizeB) else 0
                  bmvPy = reconMv(bmvPy, mcy, ry, fSizeB)
                }
                if (ptype == 3 && mIntra) {
                  mvPx = 0; mvPy = 0; bmvPx = 0; bmvPy = 0 // intra resets BOTH B predictors
                }
                // an uncoded direction of a non-intra B MB leaves its
                // predictor unchanged and contributes no prediction
                val dhx = if (fullPelF) mvPx * 2 else mvPx
                val dhy = if (fullPelF) mvPy * 2 else mvPy
                val dbx = if (fullPelB) bmvPx * 2 else bmvPx
                val dby = if (fullPelB) bmvPy * 2 else bmvPy

                if (mIntra) {
                  if (ptype >= 2 && mPattern) bail() // B.2b/B.2c have no intra+pattern row
                  lastIntra = true
                  var b = 0
                  while (b < 4) {
                    val (blk, np) = decodeBlock(r, q, predY, luma = true)
                    predY = np
                    val ox = mbAddr * 16 + (b % 2) * 8; val oy = row * 16 + (b / 2) * 8
                    var i = 0
                    while (i < 64) { y((oy + i / 8) * w + ox + i % 8) = blk(i); i += 1 }
                    b += 1
                  }
                  val (cbBlk, ncb) = decodeBlock(r, q, predCb, luma = false); predCb = ncb
                  val (crBlk, ncr) = decodeBlock(r, q, predCr, luma = false); predCr = ncr
                  var i = 0
                  while (i < 64) {
                    val cy = row * 8 + i / 8; val cx = mbAddr * 8 + i % 8
                    cb(cy * cw + cx) = cbBlk(i); cr(cy * cw + cx) = crBlk(i)
                    i += 1
                  }
                } else {
                  predY = 128; predCb = 128; predCr = 128 // DC preds reset at non-intra MBs
                  // prediction (chroma vectors halved toward zero, §2.4.4.3):
                  // P predicts forward from the last anchor; B from either
                  // or both anchors (interpolation = the spec's "//" average)
                  val (py16, pcb8, pcr8) =
                    if (ptype == 2)
                      bPredict(anchorNew, null, useF = true, useB = false,
                        w, h, mbAddr, row, dhx, dhy, 0, 0)
                    else
                      bPredict(anchorOld, anchorNew, mMotionF, mMotionB,
                        w, h, mbAddr, row, dhx, dhy, dbx, dby)
                  val cbp = if (mPattern) CbpDec.decode(r) else 0
                  if (mPattern && cbp == 0) bail()
                  // residual blocks in stream order Y0..Y3, Cb, Cr
                  val resY = new Array[Array[Int]](4)
                  var b = 0
                  while (b < 4) {
                    if (((cbp >> (5 - b)) & 1) == 1) resY(b) = idctSigned(decodeNonIntraCoefs(r, q))
                    b += 1
                  }
                  val resCb = if (((cbp >> 1) & 1) == 1) idctSigned(decodeNonIntraCoefs(r, q)) else null
                  val resCr = if ((cbp & 1) == 1) idctSigned(decodeNonIntraCoefs(r, q)) else null
                  storeMb(y, cb, cr, w, mbAddr, row, py16, pcb8, pcr8, resY, resCb, resCr)
                  lastIntra = false; lastFwd = mMotionF; lastBwd = mMotionB
                }
              }
              if (mbAddr != mbw - 1) bail() // every row slice covers its full row
              sc = r.nextStartCode()
            }
            if (nextRow != mbh) bail() // no row may be left undecoded (silent zeros)
            val fr = Frame(y, cb, cr)
            gop += ((tref, fr))
            if (ptype != 3) { anchorOld = anchorNew; anchorNew = fr } // B never becomes a reference
            code = sc
          case _ => bail()
        }
      }
      if (!r.atEnd) bail()
      flushGop()
      val fs = frames.result()
      if (fs.isEmpty) bail()
      Decoded(w, h, fs)
    }

    /** One intra block: DC (predicted, step 8) + AC (run-level, intra
      * dequant with oddification + saturation, §2.4.4.2) → IDCT. */
    private def decodeBlock(r: BitReader, qscale: Int, pred: Int,
                            luma: Boolean): (Array[Int], Int) = {
      val size = (if (luma) DcLumaDec else DcChromaDec).decode(r)
      val diff =
        if (size == 0) 0
        else {
          val v = r.read(size)
          if (v >= (1 << (size - 1))) v else v - (1 << size) + 1
        }
      val qdc = pred + diff
      if (qdc < 0 || qdc > 255) bail()
      val coef = new Array[Int](64)
      coef(0) = qdc * 8
      var zz = 0
      var done = false
      while (!done) {
        AcDec.decode(r) match {
          case AcEob => done = true
          case sym =>
            val (run, level) = sym match {
              case AcRunLevel(rn, lv) =>
                (rn, if (r.read(1) == 1) -lv else lv)
              case AcEsc =>
                val rn = r.read(6)
                val b = r.read(8)
                val lv =
                  if (b == 0) { val x = r.read(8); if (x < 128) bail(); x }
                  else if (b == 0x80) { val x = r.read(8); if (x == 0 || x > 128) bail(); x - 256 }
                  else if (b < 128) b
                  else b - 256
                if (lv == 0) bail()
                (rn, lv)
              case AcEob => bail() // unreachable
            }
            zz += run + 1
            if (zz > 63) bail()
            val w = IntraQuant(Zigzag(zz))
            var rec = (2 * level * qscale * w) / 16 // truncates toward zero
            if (rec != 0 && (rec & 1) == 0) rec -= Integer.signum(rec)
            if (rec > 2047) rec = 2047
            if (rec < -2048) rec = -2048
            coef(Zigzag(zz)) = rec
        }
      }
      (idct(coef), qdc)
    }

    /** Shared "no residual" marker for [[storeMb]] (skipped MBs). */
    private val NoResY: Array[Array[Int]] = new Array[Array[Int]](4)

    /** Macroblock prediction for P and B pictures: forward from `fwdRef`
      * and/or backward from `bwdRef` (each with its own half-pel luma
      * displacement; chroma = luma halved toward zero, §2.4.4.3).
      * Both directions → the spec's interpolation, (fwd + bwd) // 2 with
      * halves rounded away from zero (§2.4.4.4). Returns (16×16 luma,
      * 8×8 Cb, 8×8 Cr). */
    private def bPredict(fwdRef: Frame, bwdRef: Frame, useF: Boolean, useB: Boolean,
                         w: Int, h: Int, mbAddr: Int, row: Int,
                         dfx: Int, dfy: Int, dbx: Int, dby: Int): (Array[Int], Array[Int], Array[Int]) = {
      if (!useF && !useB) bail() // no motionless non-intra row exists in B.2b/B.2c
      val cw = w / 2
      def one(ref: Frame, dx: Int, dy: Int) = (
        predictInto(ref.y, w, h, mbAddr * 16, row * 16, dx, dy, 16, 16),
        predictInto(ref.cb, cw, h / 2, mbAddr * 8, row * 8, dx / 2, dy / 2, 8, 8),
        predictInto(ref.cr, cw, h / 2, mbAddr * 8, row * 8, dx / 2, dy / 2, 8, 8))
      if (useF && !useB) one(fwdRef, dfx, dfy)
      else if (useB && !useF) one(bwdRef, dbx, dby)
      else {
        val (fy, fcb, fcr) = one(fwdRef, dfx, dfy)
        val (by, bcb, bcr) = one(bwdRef, dbx, dby)
        def avg(a: Array[Int], b: Array[Int]): Array[Int] = {
          val o = new Array[Int](a.length)
          var i = 0
          while (i < a.length) { o(i) = (a(i) + b(i) + 1) >> 1; i += 1 }
          o
        }
        (avg(fy, by), avg(fcb, bcb), avg(fcr, bcr))
      }
    }

    /** Store a predicted macroblock into the output planes, adding the
      * clamped residuals where present (`resY(b)`/`resCb`/`resCr` null =
      * block not coded). */
    private def storeMb(y: Array[Int], cb: Array[Int], cr: Array[Int], w: Int,
                        mbAddr: Int, row: Int,
                        py16: Array[Int], pcb8: Array[Int], pcr8: Array[Int],
                        resY: Array[Array[Int]], resCb: Array[Int], resCr: Array[Int]): Unit = {
      val cw = w / 2
      var b = 0
      while (b < 4) {
        val ox = mbAddr * 16 + (b % 2) * 8; val oy = row * 16 + (b / 2) * 8
        val res = resY(b)
        var i = 0
        while (i < 64) {
          val p0 = py16(((b / 2) * 8 + i / 8) * 16 + (b % 2) * 8 + i % 8)
          val v = if (res == null) p0 else {
            val s0 = p0 + res(i)
            if (s0 < 0) 0 else if (s0 > 255) 255 else s0
          }
          y((oy + i / 8) * w + ox + i % 8) = v
          i += 1
        }
        b += 1
      }
      var i = 0
      while (i < 64) {
        val cy = row * 8 + i / 8; val cx = mbAddr * 8 + i % 8
        val vb = if (resCb == null) pcb8(i) else {
          val s0 = pcb8(i) + resCb(i)
          if (s0 < 0) 0 else if (s0 > 255) 255 else s0
        }
        val vr = if (resCr == null) pcr8(i) else {
          val s0 = pcr8(i) + resCr(i)
          if (s0 < 0) 0 else if (s0 > 255) 255 else s0
        }
        cb(cy * cw + cx) = vb; cr(cy * cw + cx) = vr
        i += 1
      }
    }

    /** Co-located copy (skipped macroblocks): bw×bh at (x0, y0). */
    private def copyBlock(src: Array[Int], dst: Array[Int], stride: Int,
                          x0: Int, y0: Int, bw: Int, bh: Int): Unit = {
      var yy = 0
      while (yy < bh) {
        System.arraycopy(src, (y0 + yy) * stride + x0, dst, (y0 + yy) * stride + x0, bw)
        yy += 1
      }
    }

    /** Forward prediction of a bw×bh block anchored at (x0, y0), with a
      * half-pel displacement (dhx, dhy). Half-sample positions use the
      * spec's "//" (round to nearest, halves away from zero — for the
      * non-negative sums here, +half >> 1 / +2 >> 2). Out-of-frame
      * references quarantine. */
    private def predictInto(ref: Array[Int], stride: Int, nrows: Int,
                            x0: Int, y0: Int, dhx: Int, dhy: Int,
                            bw: Int, bh: Int): Array[Int] = {
      val ix = x0 + Math.floorDiv(dhx, 2); val iy = y0 + Math.floorDiv(dhy, 2)
      val hx = dhx - 2 * Math.floorDiv(dhx, 2); val hy = dhy - 2 * Math.floorDiv(dhy, 2)
      if (ix < 0 || iy < 0 || ix + bw + hx > stride || iy + bh + hy > nrows) bail()
      val out = new Array[Int](bw * bh)
      var yy = 0
      while (yy < bh) {
        val r0 = (iy + yy) * stride
        val r1 = (iy + yy + 1) * stride
        var xx = 0
        while (xx < bw) {
          val a = ref(r0 + ix + xx)
          val v =
            if (hx == 0 && hy == 0) a
            else if (hy == 0) (a + ref(r0 + ix + xx + 1) + 1) >> 1
            else if (hx == 0) (a + ref(r1 + ix + xx) + 1) >> 1
            else (a + ref(r0 + ix + xx + 1) + ref(r1 + ix + xx) + ref(r1 + ix + xx + 1) + 2) >> 2
          out(yy * bw + xx) = v
          xx += 1
        }
        yy += 1
      }
      out
    }

    /** Differential motion reconstruction (§2.4.3.4): recon = pred +
      * delta, wrapped modulo 32f into [-16f, 16f-1]. */
    private def reconMv(pred: Int, mc: Int, res: Int, fSize: Int): Int = {
      val delta =
        if (mc == 0) 0
        else {
          val a = 1 + fSize * (math.abs(mc) - 1) + res
          if (mc < 0) -a else a
        }
      var v = pred + delta
      val max = 16 * fSize - 1; val min = -16 * fSize
      if (v > max) v -= 32 * fSize
      if (v < min) v += 32 * fSize
      if (v > max || v < min) bail()
      v
    }

    /** One coded non-intra block → dequantized coefficients.
      * dct_coeff_first ('1'+s is (0, ±1); EOB cannot appear first — a
      * leading '0' falls through to the shared B.5 walk), then
      * dct_coeff_next until EOB. Non-intra dequant (§2.4.4.3):
      * rec = ((2·level + sign)·q·W)/16 truncated toward zero, oddified,
      * saturated; W is the default (flat 16) non-intra matrix. */
    private def decodeNonIntraCoefs(r: BitReader, qscale: Int): Array[Int] = {
      val coef = new Array[Int](64)
      var zz = -1
      var first = true
      var done = false
      while (!done) {
        val sym: AcSym =
          if (first && r.peek(1) == 1) { r.read(1); AcRunLevel(0, 1) }
          else AcDec.decode(r)
        first = false
        sym match {
          case AcEob => done = true
          case s0 =>
            val (run, level) = s0 match {
              case AcRunLevel(rn, lv) =>
                (rn, if (r.read(1) == 1) -lv else lv)
              case AcEsc =>
                val rn = r.read(6)
                val b = r.read(8)
                val lv =
                  if (b == 0) { val x = r.read(8); if (x < 128) bail(); x }
                  else if (b == 0x80) { val x = r.read(8); if (x == 0 || x > 128) bail(); x - 256 }
                  else if (b < 128) b
                  else b - 256
                if (lv == 0) bail()
                (rn, lv)
              case AcEob => bail() // unreachable
            }
            zz += run + 1
            if (zz > 63) bail()
            var rec = (2 * level + Integer.signum(level)) * qscale * 16 / 16
            if (rec != 0 && (rec & 1) == 0) rec -= Integer.signum(rec)
            if (rec > 2047) rec = 2047
            if (rec < -2048) rec = -2048
            coef(Zigzag(zz)) = rec
        }
      }
      if (zz < 0) bail() // a coded block must carry at least one coefficient
      coef
    }
  }

  // ── synthetic corpora + declared queries ────────────────────────────

  /** Flat-macroblock generator formulas — shared by the corpus builder,
    * the in-plan decoder check, and (re-derived) the DuckDB oracle. */
  private def flatGeom(id: Long): (Int, Int, Int) =
    (16 * (1 + (id % 3)).toInt, 16 * (1 + (id % 2)).toInt, (1 + id % 3).toInt)
  private def flatY(id: Long, f: Int, mb: Int): Int = ((id * 7 + f * 13 + mb * 5) % 200 + 16).toInt
  private def flatCb(id: Long, f: Int, mb: Int): Int = ((id * 3 + f * 11 + mb * 2) % 200 + 20).toInt
  private def flatCr(id: Long, f: Int, mb: Int): Int = ((id * 5 + f * 3 + mb * 7) % 200 + 25).toInt

  /** Real MPEG-1 clips whose frames are flat 16×16 macroblocks — the
    * geometry where intra coding is bit-exact (DC-only blocks, fixed
    * step 8), so plane sums admit a closed-form oracle. */
  def syntheticMpeg1(spark: SparkSession, d: String): org.apache.spark.sql.Dataset[VideoRecord] = {
    import spark.implicits._
    Tables.fanOut(Tables.documents(spark, d)
      .select(col("doc_id")).as[Long])
      .map { id =>
        val (w, h, nf) = flatGeom(id)
        val mbw = w / 16; val cw = w / 2
        val frames = (0 until nf).map { f =>
          val y = new Array[Int](w * h)
          val cb = new Array[Int](w * h / 4); val cr = new Array[Int](w * h / 4)
          var py = 0
          while (py < h) {
            var px = 0
            while (px < w) {
              val mb = (py / 16) * mbw + px / 16
              y(py * w + px) = flatY(id, f, mb)
              px += 1
            }
            py += 1
          }
          var cy = 0
          while (cy < h / 2) {
            var cx = 0
            while (cx < w / 2) {
              val mb = (cy / 8) * mbw + cx / 8
              cb(cy * cw + cx) = flatCb(id, f, mb)
              cr(cy * cw + cx) = flatCr(id, f, mb)
              cx += 1
            }
            cy += 1
          }
          Frame(y, cb, cr)
        }
        VideoRecord(id, Mpeg1Codec.encode(w, h, qscale = 4, frames))
      }
  }

  /** QM13 — REAL MPEG-1 decode, verified bit-exact per record: encode
    * flat-macroblock clips as genuine I-frame streams, decode them back
    * through the full bitstream path, emit per-plane pixel sums. The
    * oracle recomputes every sum closed-form from the generator formula
    * without seeing a byte — a hash match proves headers, VLC tables,
    * the DC prediction chain, dequant and IDCT are all exact. */
  def qmMpeg1Stats(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    syntheticMpeg1(spark, d)
      .mapPartitions(_.flatMap { r =>
        Mpeg1Codec.decode(r.payload).map { dec =>
          var ys = 0L; var cbs = 0L; var crs = 0L
          dec.frames.foreach { fr =>
            fr.y.foreach(ys += _); fr.cb.foreach(cbs += _); fr.cr.foreach(crs += _)
          }
          (r.media_id, dec.width.toLong, dec.height.toLong, dec.frames.size.toLong, ys, cbs, crs)
        }
      })
      .toDF("media_id", "width", "height", "n_frames", "y_sum", "cb_sum", "cr_sum")
      .orderBy("media_id")
  }

  /** Textured generator formulas (per-pixel gradients — every AC path
    * in the codec lights up: run-level VLCs, escapes, oddification). */
  private def texGeom(id: Long): (Int, Int, Int) =
    (16 * (1 + (id % 2)).toInt, 16, (1 + id % 2).toInt)
  private def texY(id: Long, f: Int, x: Int, y: Int): Int = ((id * 31 + f * 17 + x * 3 + y * 5) % 224 + 16).toInt
  private def texCb(id: Long, f: Int, x: Int, y: Int): Int = ((id * 13 + f * 7 + x * 5 + y * 3) % 224 + 16).toInt
  private def texCr(id: Long, f: Int, x: Int, y: Int): Int = ((id * 19 + f * 23 + x * 7 + y * 11) % 224 + 16).toInt

  private def texFrames(id: Long): (Int, Int, Seq[Frame]) = {
    val (w, h, nf) = texGeom(id)
    val cw = w / 2
    val frames = (0 until nf).map { f =>
      val y = Array.tabulate(w * h)(i => texY(id, f, i % w, i / w))
      val cb = Array.tabulate(w * h / 4)(i => texCb(id, f, i % cw, i / cw))
      val cr = Array.tabulate(w * h / 4)(i => texCr(id, f, i % cw, i / cw))
      Frame(y, cb, cr)
    }
    (w, h, frames)
  }

  /** Lossy-path error bound, pinned by Mpeg1Spec: at qscale 2 the worst
    * per-pixel reconstruction error of the textured corpus (white-ish
    * per-pixel detail — the adversarial case for DCT coding). */
  val TexQscale = 2
  val TexMaxErr = 24

  /** QM14 — the AC path, SELF-CERTIFYING: textured frames (every block
    * carries dozens of AC coefficients) encode → decode, and the plan
    * itself compares the decoded pixels against the regenerated source,
    * certifying max|err| ≤ [[TexMaxErr]] per record. The oracle
    * recomputes the geometry closed-form and pins the certifications
    * TRUE — the same pattern as `qm_avi_stats` (JPEG's lossy DCT there,
    * MPEG's lossy quantizer here). */
  def qmMpeg1Roundtrip(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.fanOut(Tables.documents(spark, d)
      .select(col("doc_id")).as[Long])
      .mapPartitions(_.map { id =>
        val (w, h, frames) = texFrames(id)
        val payload = Mpeg1Codec.encode(w, h, TexQscale, frames)
        val dec = Mpeg1Codec.decode(payload)
        val geomOk = dec.exists(d0 => d0.width == w && d0.height == h && d0.frames.size == frames.size)
        var maxErr = Int.MaxValue
        if (geomOk) {
          maxErr = 0
          dec.get.frames.zip(frames).foreach { case (got, want) =>
            var i = 0
            while (i < want.y.length) { maxErr = maxErr max math.abs(got.y(i) - want.y(i)); i += 1 }
            i = 0
            while (i < want.cb.length) {
              maxErr = maxErr max math.abs(got.cb(i) - want.cb(i))
              maxErr = maxErr max math.abs(got.cr(i) - want.cr(i))
              i += 1
            }
          }
        }
        (id, w.toLong, h.toLong, frames.size.toLong, geomOk, maxErr <= TexMaxErr)
      })
      .toDF("media_id", "width", "height", "n_frames", "geom_ok", "within_bound")
      .orderBy("media_id")
  }

  // ── P-frame corpus (planted motion + planted residual) ──────────────

  /** Closed-form P-frame motion model, shared by the corpus builder and
    * (re-derived) the DuckDB oracle. Frame 0 is an I-picture of flat
    * 16×16 macroblocks; each later frame is a P-picture where MB `mb`
    * is either skipped (co-located copy) or forward-predicted from MB
    * `(mb+1) % mbs` of the previous DECODED frame (a 16-pel-aligned
    * full-pel motion vector) plus a flat nonzero residual delta. At
    * P-qscale 2 a flat delta d reconstructs exactly (level 2d → rec
    * 8d±1 → round → d), so every decoded plane sum is a pure integer
    * recurrence the oracle can unroll without seeing a byte. */
  private def pGeom(id: Long): (Int, Int, Int) =
    (16 * (1 + (id % 3)).toInt, 16 * (1 + (id % 2)).toInt, (1 + id % 3).toInt)
  private def pBaseY(id: Long, mb: Int): Int = ((id * 7 + mb * 5) % 130 + 60).toInt
  private def pBaseCb(id: Long, mb: Int): Int = ((id * 3 + mb * 2) % 130 + 62).toInt
  private def pBaseCr(id: Long, mb: Int): Int = ((id * 5 + mb * 7) % 130 + 64).toInt
  /** Never-zero delta in [-9, 10]: m ∈ [0,19) → m-9, with the zero at
    * m=9 remapped to +10. */
  private def pDelta(m: Long): Int = { val r = (m % 19).toInt; if (r == 9) 10 else r - 9 }
  private def pDeltaY(id: Long, f: Int, mb: Int): Int = pDelta(id * 11 + f * 7 + mb * 3)
  private def pDeltaCb(id: Long, f: Int, mb: Int): Int = pDelta(id * 13 + f * 5 + mb * 7)
  private def pDeltaCr(id: Long, f: Int, mb: Int): Int = pDelta(id * 17 + f * 3 + mb * 11)
  /** Skip only interior MBs of a slice row (the spec forbids skipping
    * the first/last): with mbw up to 3 that is column 1 of 3-wide rows. */
  private def pSkip(id: Long, f: Int, mb: Int, mbw: Int): Boolean =
    mbw == 3 && mb % 3 == 1 && (id + f + mb) % 2 == 0

  /** Real MPEG-1 clips exercising the full P-picture path: motion VLCs,
    * differential reconstruction, prediction copy, skipped macroblocks,
    * non-intra residual decode. qscale: I slices 4 (flat-DC exact), P
    * slices 2 (flat-residual exact). */
  def syntheticMpeg1P(spark: SparkSession, d: String): org.apache.spark.sql.Dataset[VideoRecord] = {
    import spark.implicits._
    Tables.fanOut(Tables.documents(spark, d)
      .select(col("doc_id")).as[Long])
      .map { id =>
        val (w, h, nf) = pGeom(id)
        val mbw = w / 16; val mbh = h / 16; val mbs = mbw * mbh; val cw = w / 2
        val y0 = new Array[Int](w * h)
        val cb0 = new Array[Int](w * h / 4); val cr0 = new Array[Int](w * h / 4)
        var py = 0
        while (py < h) {
          var px = 0
          while (px < w) { y0(py * w + px) = pBaseY(id, (py / 16) * mbw + px / 16); px += 1 }
          py += 1
        }
        var cy = 0
        while (cy < h / 2) {
          var cx = 0
          while (cx < w / 2) {
            val mb = (cy / 8) * mbw + cx / 8
            cb0(cy * cw + cx) = pBaseCb(id, mb); cr0(cy * cw + cx) = pBaseCr(id, mb)
            cx += 1
          }
          cy += 1
        }
        val pPics = (1 until nf).map { f =>
          val mbsCodes = (0 until mbs).map { mb =>
            if (pSkip(id, f, mb, mbw)) MbSkip
            else {
              val s = (mb + 1) % mbs
              val mvx = (s % mbw - mb % mbw) * 16
              val mvy = (s / mbw - mb / mbw) * 16
              MbPred(mvx, mvy, Some((pDeltaY(id, f, mb), pDeltaCb(id, f, mb), pDeltaCr(id, f, mb))))
            }
          }
          PPic(qscale = 2, fullPel = true, fCode = 3, mbsCodes)
        }
        VideoRecord(id, Mpeg1Codec.encodeSeq(w, h, IPic(4, Frame(y0, cb0, cr0)) +: pPics))
      }
  }

  /** QM15 — P-picture decode, verified bit-exact per record: genuine
    * I+P streams with planted permutation motion and planted residuals
    * decode through the full inter path (motion VLC table B.4,
    * differential MV wrap, prediction copy, skip, non-intra dequant),
    * and the oracle recomputes every decoded plane sum as a two-level
    * unrolled integer recurrence without seeing a byte. */
  def qmMpeg1PStats(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    syntheticMpeg1P(spark, d)
      .mapPartitions(_.flatMap { r =>
        Mpeg1Codec.decode(r.payload).map { dec =>
          var ys = 0L; var cbs = 0L; var crs = 0L
          dec.frames.foreach { fr =>
            fr.y.foreach(ys += _); fr.cb.foreach(cbs += _); fr.cr.foreach(crs += _)
          }
          (r.media_id, dec.width.toLong, dec.height.toLong, dec.frames.size.toLong, ys, cbs, crs)
        }
      })
      .toDF("media_id", "width", "height", "n_frames", "y_sum", "cb_sum", "cr_sum")
      .orderBy("media_id")
  }

  // ── B-frame corpus (planted bidirectional motion) ───────────────────

  /** Closed-form B-frame model, shared by the corpus builder and
    * (re-derived) the DuckDB oracle. Decode order I, P, B… (display
    * I, B…, P — the reorder the stream's temporal references encode).
    * Anchors: the I-picture is flat macroblocks; the P-picture is the
    * I plus a flat per-MB delta (zero motion). Each B macroblock picks
    * one of three modes from a hash — forward (horizontal-mirror MV
    * into the I), backward (vertical-mirror MV into the P), or
    * interpolated (both, averaged with the spec's "//") — optionally
    * plus a flat coded residual. All quantizer choices keep every leg
    * bit-exact (intra DC step 8; flat residual at qscale 2), so every
    * decoded plane sum — and a display-order-WEIGHTED sum that pins the
    * temporal reordering — is closed-form. */
  private def bGeom(id: Long): (Int, Int, Int) =
    (16 * (1 + (id % 3)).toInt, 16 * (1 + (id % 2)).toInt, (3 + id % 2).toInt)
  private def bBaseY(id: Long, mb: Int): Int = ((id * 9 + mb * 5) % 130 + 60).toInt
  private def bBaseCb(id: Long, mb: Int): Int = ((id * 3 + mb * 4) % 130 + 62).toInt
  private def bBaseCr(id: Long, mb: Int): Int = ((id * 7 + mb * 6) % 130 + 64).toInt
  private def bMode(id: Long, f: Int, mb: Int): Int = ((id + f * 5 + mb * 7) % 3).toInt
  private def bCoded(id: Long, f: Int, mb: Int): Boolean = (id * 3 + f + mb) % 3 != 0

  /** Real MPEG-1 clips exercising the full B-picture path: table B.2c
    * types (all six non-quant prediction rows), dual f_codes, dual MV
    * predictor chains, interpolation, and temporal reordering. */
  def syntheticMpeg1B(spark: SparkSession, d: String): org.apache.spark.sql.Dataset[VideoRecord] = {
    import spark.implicits._
    Tables.fanOut(Tables.documents(spark, d)
      .select(col("doc_id")).as[Long])
      .map { id =>
        val (w, h, nf) = bGeom(id)
        val mbw = w / 16; val mbh = h / 16; val mbs = mbw * mbh; val cw = w / 2
        val y0 = new Array[Int](w * h)
        val cb0 = new Array[Int](w * h / 4); val cr0 = new Array[Int](w * h / 4)
        var py = 0
        while (py < h) {
          var px = 0
          while (px < w) { y0(py * w + px) = bBaseY(id, (py / 16) * mbw + px / 16); px += 1 }
          py += 1
        }
        var cy = 0
        while (cy < h / 2) {
          var cx = 0
          while (cx < w / 2) {
            val mb = (cy / 8) * mbw + cx / 8
            cb0(cy * cw + cx) = bBaseCb(id, mb); cr0(cy * cw + cx) = bBaseCr(id, mb)
            cx += 1
          }
          cy += 1
        }
        // P anchor: co-located + flat delta per MB
        val pPic = PPic(qscale = 2, fullPel = true, fCode = 1, (0 until mbs).map { mb =>
          MbPred(0, 0, Some((pDelta(id * 11 + mb * 3 + 1),
            pDelta(id * 13 + mb * 7 + 2), pDelta(id * 17 + mb * 11 + 3))))
        })
        // B pictures: display indices 1 .. nf-2
        val bPics = (1 to nf - 2).map { f =>
          BPic(qscale = 2, fullPelFwd = true, fCodeFwd = 3, fullPelBwd = true, fCodeBwd = 2,
            (0 until mbs).map { mb =>
              val row = mb / mbw; val colM = mb % mbw
              val fwd = ((mbw - 1 - 2 * colM) * 16, 0) // horizontal mirror into the I
              val bwd = (0, (mbh - 1 - 2 * row) * 16)  // vertical mirror into the P
              val deltas =
                if (!bCoded(id, f, mb)) None
                else Some((pDelta(id * 13 + f * 7 + mb * 5),
                  pDelta(id * 7 + f * 11 + mb * 3), pDelta(id * 19 + f * 5 + mb * 13)))
              bMode(id, f, mb) match {
                case 0 => BPred(Some(fwd), None, deltas)
                case 1 => BPred(None, Some(bwd), deltas)
                case _ => BPred(Some(fwd), Some(bwd), deltas)
              }
            })
        }
        VideoRecord(id, Mpeg1Codec.encodeSeq(w, h, IPic(4, Frame(y0, cb0, cr0)) +: pPic +: bPics))
      }
  }

  /** QM16 — B-picture decode, verified bit-exact per record INCLUDING
    * the display reorder: genuine I/P/B streams with planted
    * bidirectional motion decode through the full B path (table B.2c,
    * dual predictor chains, "//" interpolation, temporal-reference
    * re-sort), and the oracle recomputes every plane sum — plus a
    * display-order-weighted luma sum that a wrong frame order cannot
    * reproduce — closed-form without seeing a byte. */
  def qmMpeg1BStats(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    syntheticMpeg1B(spark, d)
      .mapPartitions(_.flatMap { r =>
        Mpeg1Codec.decode(r.payload).map { dec =>
          var ys = 0L; var cbs = 0L; var crs = 0L; var wys = 0L
          dec.frames.zipWithIndex.foreach { case (fr, f) =>
            var fy = 0L
            fr.y.foreach(fy += _); fr.cb.foreach(cbs += _); fr.cr.foreach(crs += _)
            ys += fy; wys += (f + 1) * fy
          }
          (r.media_id, dec.width.toLong, dec.height.toLong, dec.frames.size.toLong, ys, wys, cbs, crs)
        }
      })
      .toDF("media_id", "width", "height", "n_frames", "y_sum", "wy_sum", "cb_sum", "cr_sum")
      .orderBy("media_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qm_mpeg1_stats" -> qmMpeg1Stats _,
    "qm_mpeg1_roundtrip" -> qmMpeg1Roundtrip _,
    "qm_mpeg1_p_stats" -> qmMpeg1PStats _,
    "qm_mpeg1_b_stats" -> qmMpeg1BStats _)

  /** B-frame recurrence closed-form (built programmatically — the same
    * per-MB expression appears for two B frames × three planes).
    * MATERIALIZED CTEs keep DuckDB from inlining the chain
    * exponentially. Display order is I, B1[, B2], P; wy_sum weights the
    * luma sums by display position, so a decoder that failed to re-sort
    * by temporal_reference could not hash-match. */
  private val bStatsOracle: String = {
    def d(m: String) = s"CASE WHEN ($m) % 19 = 9 THEN 10 ELSE ($m) % 19 - 9 END"
    val sF = "(mb//mbw)*mbw + (mbw-1 - (mb%mbw)) + 1" // horizontal mirror, 1-based
    val sB = "(mbh-1 - (mb//mbw))*mbw + (mb%mbw) + 1" // vertical mirror, 1-based
    def bl(f: Int, a0: String, ap: String, dm: String) =
      s"list_transform(range(mbs), mb -> (CASE (media_id + $f*5 + mb*7) % 3 " +
        s"WHEN 0 THEN $a0[$sF] WHEN 1 THEN $ap[$sB] " +
        s"ELSE ($a0[$sF] + $ap[$sB] + 1) // 2 END) + " +
        s"(CASE WHEN (media_id*3 + $f + mb) % 3 != 0 THEN ${d(dm)} ELSE 0 END))"
    "WITH g AS MATERIALIZED (SELECT doc_id AS media_id, " +
      "16*(1 + doc_id % 3) AS width, 16*(1 + doc_id % 2) AS height, " +
      "3 + doc_id % 2 AS n_frames, 1 + doc_id % 3 AS mbw, 1 + doc_id % 2 AS mbh, " +
      "(1 + doc_id % 3)*(1 + doc_id % 2) AS mbs FROM documents), " +
      "b AS MATERIALIZED (SELECT *, " +
      "list_transform(range(mbs), mb -> (media_id*9 + mb*5) % 130 + 60) AS y0, " +
      "list_transform(range(mbs), mb -> (media_id*3 + mb*4) % 130 + 62) AS cb0, " +
      "list_transform(range(mbs), mb -> (media_id*7 + mb*6) % 130 + 64) AS cr0 FROM g), " +
      "p AS MATERIALIZED (SELECT *, " +
      s"list_transform(range(mbs), mb -> y0[mb+1] + (${d("media_id*11 + mb*3 + 1")})) AS yp, " +
      s"list_transform(range(mbs), mb -> cb0[mb+1] + (${d("media_id*13 + mb*7 + 2")})) AS cbp, " +
      s"list_transform(range(mbs), mb -> cr0[mb+1] + (${d("media_id*17 + mb*11 + 3")})) AS crp FROM b), " +
      "f1 AS MATERIALIZED (SELECT *, " +
      s"${bl(1, "y0", "yp", "media_id*13 + 1*7 + mb*5")} AS yb1, " +
      s"${bl(1, "cb0", "cbp", "media_id*7 + 1*11 + mb*3")} AS cbb1, " +
      s"${bl(1, "cr0", "crp", "media_id*19 + 1*5 + mb*13")} AS crb1 FROM p), " +
      "f2 AS MATERIALIZED (SELECT *, " +
      s"${bl(2, "y0", "yp", "media_id*13 + 2*7 + mb*5")} AS yb2, " +
      s"${bl(2, "cb0", "cbp", "media_id*7 + 2*11 + mb*3")} AS cbb2, " +
      s"${bl(2, "cr0", "crp", "media_id*19 + 2*5 + mb*13")} AS crb2 FROM f1) " +
      "SELECT media_id, width, height, n_frames, " +
      "CAST(256*(list_sum(y0) + list_sum(yb1) + (CASE WHEN n_frames = 4 THEN list_sum(yb2) ELSE 0 END) + list_sum(yp)) AS BIGINT) AS y_sum, " +
      "CAST(256*(list_sum(y0) + 2*list_sum(yb1) + (CASE WHEN n_frames = 4 THEN 3*list_sum(yb2) + 4*list_sum(yp) ELSE 3*list_sum(yp) END)) AS BIGINT) AS wy_sum, " +
      "CAST(64*(list_sum(cb0) + list_sum(cbb1) + (CASE WHEN n_frames = 4 THEN list_sum(cbb2) ELSE 0 END) + list_sum(cbp)) AS BIGINT) AS cb_sum, " +
      "CAST(64*(list_sum(cr0) + list_sum(crb1) + (CASE WHEN n_frames = 4 THEN list_sum(crb2) ELSE 0 END) + list_sum(crp)) AS BIGINT) AS cr_sum " +
      "FROM f2 ORDER BY media_id"
  }

  val oracles: Map[String, String] = Map(
    "qm_mpeg1_b_stats" -> bStatsOracle,
    // every decoded plane sum recomputed closed-form: flat 16×16 MBs ⇒
    // luma contributes 256·v per MB, each chroma plane 64·v per MB
    // (4:2:0); i enumerates (frame, mb) pairs
    "qm_mpeg1_stats" ->
      ("WITH d AS (SELECT doc_id AS media_id, 16*(1 + doc_id % 3) AS width, " +
        "16*(1 + doc_id % 2) AS height, 1 + doc_id % 3 AS n_frames FROM documents), " +
        "g AS (SELECT media_id, width, height, n_frames, " +
        "(width//16)*(height//16) AS mbs FROM d) " +
        "SELECT media_id, width, height, n_frames, " +
        "CAST(256 * list_sum(list_transform(range(n_frames*mbs), " +
        "i -> (media_id*7 + (i//mbs)*13 + (i%mbs)*5) % 200 + 16)) AS BIGINT) AS y_sum, " +
        "CAST(64 * list_sum(list_transform(range(n_frames*mbs), " +
        "i -> (media_id*3 + (i//mbs)*11 + (i%mbs)*2) % 200 + 20)) AS BIGINT) AS cb_sum, " +
        "CAST(64 * list_sum(list_transform(range(n_frames*mbs), " +
        "i -> (media_id*5 + (i//mbs)*3 + (i%mbs)*7) % 200 + 25)) AS BIGINT) AS cr_sum " +
        "FROM g ORDER BY media_id"),
    // P-frame recurrence unrolled closed-form (≤ 2 P-frames per clip):
    // v0 = flat-MB base values; v_f[mb] = skipped ? v_{f-1}[mb]
    // : v_{f-1}[(mb+1) % mbs] + planted delta. MATERIALIZED CTEs keep
    // DuckDB from inlining the chain exponentially.
    "qm_mpeg1_p_stats" ->
      ("WITH g AS MATERIALIZED (SELECT doc_id AS media_id, " +
        "16*(1 + doc_id % 3) AS width, 16*(1 + doc_id % 2) AS height, " +
        "1 + doc_id % 3 AS n_frames, 1 + doc_id % 3 AS mbw, " +
        "(1 + doc_id % 3)*(1 + doc_id % 2) AS mbs FROM documents), " +
        "b AS MATERIALIZED (SELECT media_id, width, height, n_frames, mbw, mbs, " +
        "list_transform(range(mbs), mb -> (media_id*7 + mb*5) % 130 + 60) AS y0, " +
        "list_transform(range(mbs), mb -> (media_id*3 + mb*2) % 130 + 62) AS cb0, " +
        "list_transform(range(mbs), mb -> (media_id*5 + mb*7) % 130 + 64) AS cr0 FROM g), " +
        "v1 AS MATERIALIZED (SELECT *, " +
        "list_transform(range(mbs), mb -> CASE WHEN mbw = 3 AND mb % 3 = 1 AND (media_id + 1 + mb) % 2 = 0 " +
        "THEN y0[mb+1] ELSE y0[((mb+1) % mbs)+1] + " +
        "(CASE WHEN (media_id*11 + 7 + mb*3) % 19 = 9 THEN 10 ELSE (media_id*11 + 7 + mb*3) % 19 - 9 END) END) AS y1, " +
        "list_transform(range(mbs), mb -> CASE WHEN mbw = 3 AND mb % 3 = 1 AND (media_id + 1 + mb) % 2 = 0 " +
        "THEN cb0[mb+1] ELSE cb0[((mb+1) % mbs)+1] + " +
        "(CASE WHEN (media_id*13 + 5 + mb*7) % 19 = 9 THEN 10 ELSE (media_id*13 + 5 + mb*7) % 19 - 9 END) END) AS cb1, " +
        "list_transform(range(mbs), mb -> CASE WHEN mbw = 3 AND mb % 3 = 1 AND (media_id + 1 + mb) % 2 = 0 " +
        "THEN cr0[mb+1] ELSE cr0[((mb+1) % mbs)+1] + " +
        "(CASE WHEN (media_id*17 + 3 + mb*11) % 19 = 9 THEN 10 ELSE (media_id*17 + 3 + mb*11) % 19 - 9 END) END) AS cr1 " +
        "FROM b), " +
        "v2 AS MATERIALIZED (SELECT *, " +
        "list_transform(range(mbs), mb -> CASE WHEN mbw = 3 AND mb % 3 = 1 AND (media_id + 2 + mb) % 2 = 0 " +
        "THEN y1[mb+1] ELSE y1[((mb+1) % mbs)+1] + " +
        "(CASE WHEN (media_id*11 + 14 + mb*3) % 19 = 9 THEN 10 ELSE (media_id*11 + 14 + mb*3) % 19 - 9 END) END) AS y2, " +
        "list_transform(range(mbs), mb -> CASE WHEN mbw = 3 AND mb % 3 = 1 AND (media_id + 2 + mb) % 2 = 0 " +
        "THEN cb1[mb+1] ELSE cb1[((mb+1) % mbs)+1] + " +
        "(CASE WHEN (media_id*13 + 10 + mb*7) % 19 = 9 THEN 10 ELSE (media_id*13 + 10 + mb*7) % 19 - 9 END) END) AS cb2, " +
        "list_transform(range(mbs), mb -> CASE WHEN mbw = 3 AND mb % 3 = 1 AND (media_id + 2 + mb) % 2 = 0 " +
        "THEN cr1[mb+1] ELSE cr1[((mb+1) % mbs)+1] + " +
        "(CASE WHEN (media_id*17 + 6 + mb*11) % 19 = 9 THEN 10 ELSE (media_id*17 + 6 + mb*11) % 19 - 9 END) END) AS cr2 " +
        "FROM v1) " +
        "SELECT media_id, width, height, n_frames, " +
        "CAST(256*(list_sum(y0) + CASE WHEN n_frames > 1 THEN list_sum(y1) ELSE 0 END + " +
        "CASE WHEN n_frames > 2 THEN list_sum(y2) ELSE 0 END) AS BIGINT) AS y_sum, " +
        "CAST(64*(list_sum(cb0) + CASE WHEN n_frames > 1 THEN list_sum(cb1) ELSE 0 END + " +
        "CASE WHEN n_frames > 2 THEN list_sum(cb2) ELSE 0 END) AS BIGINT) AS cb_sum, " +
        "CAST(64*(list_sum(cr0) + CASE WHEN n_frames > 1 THEN list_sum(cr1) ELSE 0 END + " +
        "CASE WHEN n_frames > 2 THEN list_sum(cr2) ELSE 0 END) AS BIGINT) AS cr_sum " +
        "FROM v2 ORDER BY media_id"),
    // geometry closed-form; the lossy-path certifications are computed
    // in-plan and pinned TRUE here (qm_avi_stats pattern)
    "qm_mpeg1_roundtrip" ->
      ("SELECT doc_id AS media_id, 16*(1 + doc_id % 2) AS width, " +
        "16 AS height, 1 + doc_id % 2 AS n_frames, " +
        "TRUE AS geom_ok, TRUE AS within_bound " +
        "FROM documents ORDER BY media_id"))
}
