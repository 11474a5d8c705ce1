package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

import graft.sources.Tables
import Mp4.{BitReader, BitWriter, Mp4Malformed, Pps, Sps,
  emulationPrevent, emulationStrip}

/** REAL H.264 CAVLC I-slice decode (ITU-T H.264 §7.3.5, §8.3, §8.5,
  * §9.2) for the DENSE-RESIDUAL subset — pure JVM, narrowing the last
  * multimodal exclusion: entropy-coded intra pictures. [[H264Pcm]]
  * decodes the raw-sample escape hatch; this module decodes real
  * entropy-coded residuals — I_4x4 and I_16x16 macroblocks with all
  * intra prediction modes, CAVLC level codes with suffix adaptation
  * and the full level-escape ladder, dequantization and the integer
  * inverse transforms (4×4 core, 4×4 luma-DC Hadamard, 2×2 chroma DC),
  * QP tracking with the chroma mapping, and reconstruction clipping.
  *
  * THE SUBSET, and why it is drawn exactly here: this sandbox has no
  * copy of the ITU VLC constants and no codec library to cross-decode
  * against (zero egress; verified: no ffmpeg/jcodec/openh264 anywhere
  * on disk), and an attempted from-memory transcription of Table 9-5
  * was CAUGHT WRONG by this module's own prefix-free canary — shipping
  * those tables would risk silently-wrong pixels on conformant input,
  * the one failure mode the multimodal contract forbids. So the codec
  * confines itself to bitstreams whose every coded block is DENSE
  * (TotalCoeff == maxNumCoeff): then the only entropy codes consumed
  * are the nC ≥ 8 coeff_token — a 6-bit FIXED-LENGTH code, pure
  * formula from §9.2.1, no table — the 18-entry chroma-DC coeff_token
  * table (small enough to transcribe with confidence; prefix-free
  * canary green), the table-free trailing-one signs and §9.2.2 level
  * arithmetic, and NO total_zeros / run_before at all (zero zeros to
  * distribute). Density is arranged structurally: macroblock (0,0) is
  * I_PCM (its blocks seed every neighbor count at 16), every coded
  * block carries all its coefficients, so every coeff_token context in
  * the picture is nC ≥ 8 by induction. A dense stream is FULLY
  * CONFORMANT H.264 — any real decoder plays it; real streams that
  * stay dense decode here exactly; anything sparse quarantines as
  * None, never a wrong pixel.
  *
  * Both halves live here, and that IS the exactness proof's shape (the
  * [[Mpeg1]] adjudication): the encoder contains the decoder — it
  * quantizes real pixels, then runs the NORMATIVE inverse path to
  * compute the reconstruction a conformant decoder must produce; the
  * decode of the emitted bitstream is asserted BYTE-EXACT against that
  * reference. Fixtures disable the in-loop deblocking filter through
  * the real syntax (PPS `deblocking_filter_control_present_flag` +
  * slice `disable_deblocking_filter_idc` = 1), so pre-filter
  * reconstruction is the conformant output — intra prediction always
  * reads pre-filter samples (§8.3.1), so prediction chains are
  * unaffected.
  *
  * Still quarantined, loudly: sparse residuals (the unverifiable VLC
  * tables), CABAC, P/B slices, 8×8 transform, field/MBAFF coding,
  * multi-slice pictures.
  *
  * PERMANENT ADJUDICATION (r15, closing the sparse-residual question
  * for good): the contexts-0–7 coeff_token (Table 9-5), total_zeros
  * (Tables 9-7/9-8), and run_before (Table 9-10) codes CANNOT be
  * verified in this sandbox, by the nature of the tables themselves —
  * not by lack of effort:
  *  1. They are EMPIRICALLY-designed Huffman assignments. The spec
  *     imposes only prefix-freeness and completeness, which
  *     exponentially many distinct assignments satisfy — a structural
  *     generator + canary can REJECT malformed candidates but can
  *     never SELECT the one conformant assignment. There is nothing
  *     to derive the tables FROM.
  *  2. Encoder-contains-decoder round-trips (this module's proof shape
  *     for everything else) prove SELF-consistency only: a
  *     wrong-but-prefix-free table passes every randomized round-trip
  *     while emitting bitstreams every real decoder misplays — and
  *     would decode real streams to silently wrong pixels, the one
  *     failure mode the multimodal contract forbids. The dense subset
  *     is different in kind: its codes are a closed-form FLC formula
  *     and an 18-entry table, not a recalled 400-entry assignment.
  *  3. The r14 attempt is the direct evidence: one from-memory
  *     Table 9-5 transcription was already caught structurally wrong
  *     by the prefix-free canary — and a transcription that happened
  *     to pass the canary would still carry exactly the undetectable
  *     assignment risk of (1).
  * The quarantine narrows only if a verifiable source enters the
  * environment: the ITU-T H.264 table text itself, a reference codec
  * to cross-decode against, or conformance bitstreams with known
  * reconstructions. Until one does, sparse input returning None IS the
  * correct behavior, and this item is closed — not to be re-attempted
  * from memory. */
object H264Cavlc {

  // ───────────────────────────────────────────────────────────────────
  // CAVLC entropy codes of the dense subset: the 6-bit FLC coeff_token
  // (nC >= 8, §9.2.1 — formula, no table) and the chroma-DC coeff_token
  // table (Table 9-5 last column; nC == -1, 4:2:0). The sparse-residual
  // tables (contexts 0-2, total_zeros, run_before) are deliberately
  // ABSENT — see the object scaladoc.
  // ───────────────────────────────────────────────────────────────────

  /** Chroma-DC coeff_token (len, bits) at [totalCoeff*4 + t1s]. */
  private val chromaDcTokenLen: Array[Int] = Array(
    2, 0, 0, 0, 6, 1, 0, 0, 6, 6, 3, 0, 6, 7, 7, 6,
    6, 8, 8, 7)
  private val chromaDcTokenBits: Array[Int] = Array(
    1, 0, 0, 0, 7, 1, 0, 0, 4, 6, 1, 0, 3, 3, 2, 5,
    2, 3, 2, 0)

  /** The spec-test surface: the VLC tables in use, as (name, (len,
    * bits)) rows, for prefix-freeness validation. */
  private[graft] def vlcTablesForAudit: Seq[(String, Seq[(Int, Int)])] = {
    def pairs(len: Array[Int], bits: Array[Int]): Seq[(Int, Int)] =
      len.indices.collect { case i if len(i) > 0 => (len(i), bits(i)) }
    Seq("chroma_dc_coeff_token" ->
      pairs(chromaDcTokenLen, chromaDcTokenBits))
  }

  // ───────────────────────────────────────────────────────────────────
  // Bit-level VLC read/write
  // ───────────────────────────────────────────────────────────────────

  /** Read one code from a (len, bits) table by incremental prefix
    * match; returns the matched index. Max code length 16. */
  private def readVlc(r: BitReader, len: Array[Int], bits: Array[Int],
                      what: String): Int = {
    var acc = 0
    var n = 0
    while (n < 17) {
      acc = (acc << 1) | r.u(1)
      n += 1
      var i = 0
      while (i < len.length) {
        if (len(i) == n && bits(i) == acc) return i
        i += 1
      }
    }
    throw new Mp4Malformed(s"h264: no $what code matches")
  }

  /** coeff_token → (totalCoeff, trailingOnes). nC ≥ 8 is the 6-bit FLC
    * (§9.2.1, pure formula); nC == -1 the chroma-DC table; 0 ≤ nC < 8
    * needs the sparse-context tables this sandbox cannot ground-truth —
    * QUARANTINED (see the object scaladoc). */
  private def readCoeffToken(r: BitReader, nC: Int): (Int, Int) = {
    if (nC >= 8) {
      val v = r.u(6)
      if (v == 3) return (0, 0) // the 000011 escape for (0,0)
      val tc = (v >> 2) + 1
      val t1 = v & 3
      if (t1 > math.min(tc, 3)) throw new Mp4Malformed("h264: bad FLC coeff_token")
      (tc, t1)
    } else if (nC < 0) {
      val i = readVlc(r, chromaDcTokenLen, chromaDcTokenBits, "coeff_token")
      (i / 4, i % 4)
    } else throw new Mp4Malformed(
      s"h264: coeff_token context nC=$nC (sparse residual) is out of the " +
        "verifiable subset")
  }

  private def writeCoeffToken(w: BitWriter, nC: Int, tc: Int, t1: Int): Unit = {
    if (nC >= 8) {
      if (tc == 0) w.u(3, 6)
      else w.u(((tc - 1) << 2) | t1, 6)
    } else if (nC < 0) {
      val i = tc * 4 + t1
      require(i < chromaDcTokenLen.length && chromaDcTokenLen(i) > 0,
        s"h264: chroma-DC coeff_token ($tc,$t1) invalid")
      w.u(chromaDcTokenBits(i), chromaDcTokenLen(i))
    } else throw new Mp4Malformed(
      s"h264: cannot emit a sparse-context coeff_token (nC=$nC)")
  }

  /** Decode one non-trailing-one level (§9.2.2.1), returning the signed
    * level; `suffixLength` adapts OUTSIDE this call. */
  private def readLevel(r: BitReader, suffixLength: Int,
                        firstAfterT1s: Boolean): Int = {
    var prefix = 0
    while (r.u(1) == 0) {
      prefix += 1
      if (prefix > 31) throw new Mp4Malformed("h264: level_prefix too long")
    }
    val suffixSize =
      if (prefix == 14 && suffixLength == 0) 4
      else if (prefix >= 15) prefix - 3
      else suffixLength
    var levelCode = math.min(15, prefix) << suffixLength
    if (suffixSize > 0) levelCode += r.u(suffixSize)
    if (prefix >= 15 && suffixLength == 0) levelCode += 15
    if (prefix >= 16) levelCode += (1 << (prefix - 3)) - 4096
    if (firstAfterT1s) levelCode += 2
    if (levelCode % 2 == 0) (levelCode + 2) >> 1 else -((levelCode + 1) >> 1)
  }

  /** Encode `level` (the §9.2.2.1 inverse). */
  private def writeLevel(w: BitWriter, level: Int, suffixLength: Int,
                         firstAfterT1s: Boolean): Unit = {
    var levelCode = if (level > 0) 2 * level - 2 else -2 * level - 1
    if (firstAfterT1s) levelCode -= 2
    require(levelCode >= 0, s"h264: level $level unencodable here")
    if (suffixLength == 0) {
      if (levelCode < 14) { w.u(0, levelCode); w.u(1, 1) } // prefix only
      else if (levelCode < 30) { // prefix 14, 4-bit suffix
        w.u(0, 14); w.u(1, 1); w.u(levelCode - 14, 4)
      } else encodeEscape(w, levelCode - 30) // escape base: 15<<0 + 15
    } else {
      val maxPlain = (15 << suffixLength) - 1
      if (levelCode <= maxPlain) {
        val prefix = levelCode >> suffixLength
        w.u(0, prefix); w.u(1, 1)
        w.u(levelCode & ((1 << suffixLength) - 1), suffixLength)
      } else encodeEscape(w, levelCode - (15 << suffixLength))
    }
  }

  /** level_prefix >= 15 escape: code the residue in prefix-sized
    * suffixes (prefix p carries 2^(p-3) values above the base). */
  private def encodeEscape(w: BitWriter, residue0: Int): Unit = {
    var prefix = 15
    var base = 0
    while (residue0 - base >= (1 << (prefix - 3)) && prefix < 31) {
      base += (1 << (prefix - 3)); prefix += 1
    }
    require(prefix < 31, s"h264: level residue $residue0 too large")
    w.u(0, prefix); w.u(1, 1)
    w.u(residue0 - base, prefix - 3)
  }

  // ───────────────────────────────────────────────────────────────────
  // residual_block_cavlc (§7.3.5.3.2 / §9.2), dense subset: every coded
  // block carries ALL maxNumCoeff coefficients (or none), so
  // total_zeros is structurally 0 and run_before never appears in the
  // bitstream — the two table families the sandbox cannot verify are
  // never consulted. Coefficients in SCAN order (caller zigzags);
  // maxNumCoeff ∈ {4, 15, 16}.
  // ───────────────────────────────────────────────────────────────────

  /** Decode one residual block into `out` (scan order, length
    * maxNumCoeff); returns totalCoeff (the caller's nC bookkeeping).
    * Sparse blocks (0 < totalCoeff < maxNumCoeff) quarantine. */
  private[graft] def readResidualBlock(r: BitReader, nC: Int,
                                       maxNumCoeff: Int,
                                       out: Array[Int]): Int = {
    java.util.Arrays.fill(out, 0, maxNumCoeff, 0)
    val (tc, t1) = readCoeffToken(r, nC)
    if (tc == 0) return 0
    if (tc > maxNumCoeff) throw new Mp4Malformed("h264: totalCoeff > max")
    if (tc < maxNumCoeff) throw new Mp4Malformed(
      s"h264: sparse residual block ($tc/$maxNumCoeff coeffs) is out of " +
        "the verifiable subset (total_zeros/run_before tables)")
    val levels = new Array[Int](tc)
    var i = 0
    while (i < t1) { levels(i) = if (r.u(1) == 1) -1 else 1; i += 1 }
    var suffixLength = if (tc > 10 && t1 < 3) 1 else 0
    while (i < tc) {
      val lv = readLevel(r, suffixLength, firstAfterT1s = i == t1 && t1 < 3)
      levels(i) = lv
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(lv) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    // dense: totalZeros == 0, every run_before == 0; placement (§9.2.4)
    // walks levels from the LAST decoded (lowest frequency) upward
    var coeffNum = -1
    i = tc - 1
    while (i >= 0) {
      coeffNum += 1
      out(coeffNum) = levels(i)
      i -= 1
    }
    tc
  }

  /** Encode one residual block from `coeffs` (scan order, all-zero or
    * DENSE — every position nonzero); returns totalCoeff. Exact inverse
    * of [[readResidualBlock]]. */
  private[graft] def writeResidualBlock(w: BitWriter, nC: Int,
                                        maxNumCoeff: Int,
                                        coeffs: Array[Int]): Int = {
    val tc = coeffs.take(maxNumCoeff).count(_ != 0)
    if (tc == 0) { writeCoeffToken(w, nC, 0, 0); return 0 }
    require(tc == maxNumCoeff,
      s"h264: the dense encoder was handed a sparse block ($tc/$maxNumCoeff)")
    // highest frequency first
    val idx = (maxNumCoeff - 1 to 0 by -1).toArray
    var t1 = 0
    while (t1 < 3 && math.abs(coeffs(idx(t1))) == 1) t1 += 1
    writeCoeffToken(w, nC, tc, t1)
    var i = 0
    while (i < t1) { w.u(if (coeffs(idx(i)) < 0) 1 else 0, 1); i += 1 }
    var suffixLength = if (tc > 10 && t1 < 3) 1 else 0
    while (i < tc) {
      val lv = coeffs(idx(i))
      writeLevel(w, lv, suffixLength, firstAfterT1s = i == t1 && t1 < 3)
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(lv) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    tc // dense: no total_zeros, no run_before
  }

  // ───────────────────────────────────────────────────────────────────
  // Transforms + (de)quantization (§8.5)
  // ───────────────────────────────────────────────────────────────────

  /** 4x4 zigzag: scan position → raster position (§8.5.6). */
  private[graft] val zigzag4x4: Array[Int] =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** Dequant normAdjust V (§8.5.9), rows qp%6, cols position class. */
  private val dequantV = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))

  /** Forward quant MF (the JM encoder constants — encoder-side only,
    * non-normative: any level choice yields a conformant stream). */
  private val quantMF = Array(
    Array(13107, 5243, 8066), Array(11916, 4660, 7490),
    Array(10082, 4194, 6554), Array(9362, 3647, 5825),
    Array(8192, 3355, 5243), Array(7282, 2893, 4559))

  /** Position class for V/MF: 0 at even-even, 1 at odd-odd, 2 mixed. */
  private def posClass(raster: Int): Int = {
    val r = raster >> 2; val c = raster & 3
    if ((r & 1) == 0 && (c & 1) == 0) 0
    else if ((r & 1) == 1 && (c & 1) == 1) 1
    else 2
  }

  /** Core forward 4x4 (encoder-side; raster in/out). */
  private def forward4x4(x: Array[Int]): Array[Int] = {
    val t = new Array[Int](16); val out = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a = x(i * 4); val b = x(i * 4 + 1); val c = x(i * 4 + 2); val d = x(i * 4 + 3)
      val s0 = a + d; val s1 = b + c; val s2 = b - c; val s3 = a - d
      t(i * 4) = s0 + s1; t(i * 4 + 1) = 2 * s3 + s2
      t(i * 4 + 2) = s0 - s1; t(i * 4 + 3) = s3 - 2 * s2
      i += 1
    }
    i = 0
    while (i < 4) {
      val a = t(i); val b = t(4 + i); val c = t(8 + i); val d = t(12 + i)
      val s0 = a + d; val s1 = b + c; val s2 = b - c; val s3 = a - d
      out(i) = s0 + s1; out(4 + i) = 2 * s3 + s2
      out(8 + i) = s0 - s1; out(12 + i) = s3 - 2 * s2
      i += 1
    }
    out
  }

  /** NORMATIVE inverse 4x4 (§8.5.12.2) with the final (x+32)>>6;
    * input dequantized coefficients, output residual (raster). */
  private def inverse4x4(d: Array[Int]): Array[Int] = {
    val e = new Array[Int](16); val out = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val d0 = d(i * 4); val d1 = d(i * 4 + 1); val d2 = d(i * 4 + 2); val d3 = d(i * 4 + 3)
      val e0 = d0 + d2; val e1 = d0 - d2
      val e2 = (d1 >> 1) - d3; val e3 = d1 + (d3 >> 1)
      e(i * 4) = e0 + e3; e(i * 4 + 1) = e1 + e2
      e(i * 4 + 2) = e1 - e2; e(i * 4 + 3) = e0 - e3
      i += 1
    }
    i = 0
    while (i < 4) {
      val d0 = e(i); val d1 = e(4 + i); val d2 = e(8 + i); val d3 = e(12 + i)
      val e0 = d0 + d2; val e1 = d0 - d2
      val e2 = (d1 >> 1) - d3; val e3 = d1 + (d3 >> 1)
      out(i) = (e0 + e3 + 32) >> 6; out(4 + i) = (e1 + e2 + 32) >> 6
      out(8 + i) = (e1 - e2 + 32) >> 6; out(12 + i) = (e0 - e3 + 32) >> 6
      i += 1
    }
    out
  }

  /** 4x4 Hadamard (both directions share the butterfly; §8.5.10). */
  private def hadamard4x4(d: Array[Int]): Array[Int] = {
    val t = new Array[Int](16); val out = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val d0 = d(i * 4); val d1 = d(i * 4 + 1); val d2 = d(i * 4 + 2); val d3 = d(i * 4 + 3)
      val e0 = d0 + d2; val e1 = d0 - d2; val e2 = d1 - d3; val e3 = d1 + d3
      t(i * 4) = e0 + e3; t(i * 4 + 1) = e1 + e2
      t(i * 4 + 2) = e1 - e2; t(i * 4 + 3) = e0 - e3
      i += 1
    }
    i = 0
    while (i < 4) {
      val d0 = t(i); val d1 = t(4 + i); val d2 = t(8 + i); val d3 = t(12 + i)
      val e0 = d0 + d2; val e1 = d0 - d2; val e2 = d1 - d3; val e3 = d1 + d3
      out(i) = e0 + e3; out(4 + i) = e1 + e2
      out(8 + i) = e1 - e2; out(12 + i) = e0 - e3
      i += 1
    }
    out
  }

  /** Dequantize a 4x4 block (scan-order levels → raster coefficients).
    * With `skipDc` the input is a 15-entry AC array (scan slots 1..15;
    * the DC arrives via the separate transform) and raster 0 stays 0. */
  private def dequant4x4(levels: Array[Int], qp: Int,
                         skipDc: Boolean): Array[Int] = {
    val out = new Array[Int](16)
    val m = qp % 6; val shift = qp / 6
    var s = if (skipDc) 1 else 0
    while (s < 16) {
      val raster = zigzag4x4(s)
      val lv = levels(if (skipDc) s - 1 else s)
      out(raster) = (lv * dequantV(m)(posClass(raster))) << shift
      s += 1
    }
    out
  }

  /** Luma DC: inverse Hadamard then §8.5.10 scaling. `dcScan` are the
    * 16 DC levels in zigzag scan order over the 4x4 DC grid. */
  private def dequantLumaDc(dcScan: Array[Int], qp: Int): Array[Int] = {
    val raster = new Array[Int](16)
    var s = 0
    while (s < 16) { raster(zigzag4x4(s)) = dcScan(s); s += 1 }
    val f = hadamard4x4(raster)
    val v = dequantV(qp % 6)(0)
    val out = new Array[Int](16)
    var i = 0
    while (i < 16) {
      out(i) =
        if (qp >= 36) (f(i) * v) << (qp / 6 - 6)
        else (f(i) * v + (1 << (5 - qp / 6))) >> (6 - qp / 6)
      i += 1
    }
    out
  }

  /** Chroma DC: 2x2 transform then §8.5.11 scaling. Raster 2x2 in. */
  private def dequantChromaDc(c: Array[Int], qpc: Int): Array[Int] = {
    val f = Array(
      c(0) + c(1) + c(2) + c(3), c(0) - c(1) + c(2) - c(3),
      c(0) + c(1) - c(2) - c(3), c(0) - c(1) - c(2) + c(3))
    val v = dequantV(qpc % 6)(0)
    f.map(x => ((x * v) << (qpc / 6)) >> 5)
  }

  /** Encoder-side quantization of a forward-transformed 4x4 (raster in,
    * SCAN-order levels out); with `skipDc` the output is the 15-entry
    * AC array (scan slots 1..15). */
  private def quant4x4(w: Array[Int], qp: Int, skipDc: Boolean): Array[Int] = {
    val out = new Array[Int](if (skipDc) 15 else 16)
    val m = qp % 6; val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3 // intra rounding
    var s = if (skipDc) 1 else 0
    while (s < 16) {
      val raster = zigzag4x4(s)
      val x = w(raster)
      val lv = (math.abs(x).toLong * quantMF(m)(posClass(raster)) + f) >> qbits
      out(if (skipDc) s - 1 else s) = (if (x < 0) -lv else lv).toInt
      s += 1
    }
    out
  }

  /** Table 8-15: QPy (+offset) → QPc. */
  private val qpcTab = Array(
    29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36,
    37, 37, 37, 38, 38, 38, 39, 39, 39, 39)
  private def chromaQp(qp: Int, off: Int): Int = {
    val qpi = math.max(0, math.min(51, qp + off))
    if (qpi < 30) qpi else qpcTab(qpi - 30)
  }

  private def clip1(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ───────────────────────────────────────────────────────────────────
  // Intra prediction (§8.3) over the reconstruction planes
  // ───────────────────────────────────────────────────────────────────

  /** Neighbor samples for a 4x4 prediction at (x, y): top[0..7]
    * (4..7 substituted per §8.3.1.2 when top-right is unavailable),
    * left[0..3], corner. Flags say which are real. */
  private final class Nbr4(plane: Array[Byte], stride: Int, x: Int, y: Int,
                           val hasLeft: Boolean, val hasTop: Boolean,
                           hasTopRight: Boolean, val hasCorner: Boolean) {
    val top = new Array[Int](8)
    val left = new Array[Int](4)
    var corner = 0
    if (hasTop) {
      var i = 0
      while (i < 4) { top(i) = plane((y - 1) * stride + x + i) & 0xFF; i += 1 }
      while (i < 8) {
        top(i) =
          if (hasTopRight) plane((y - 1) * stride + x + i) & 0xFF
          else top(3)
        i += 1
      }
    }
    if (hasLeft) {
      var j = 0
      while (j < 4) { left(j) = plane((y + j) * stride + x - 1) & 0xFF; j += 1 }
    }
    if (hasCorner) corner = plane((y - 1) * stride + x - 1) & 0xFF
  }

  /** Luma 4x4 prediction, modes 0..8 (§8.3.1.2); out is raster 4x4. */
  private def predict4x4(n: Nbr4, mode: Int, out: Array[Int]): Unit = {
    val t = n.top; val l = n.left; val c = n.corner
    def set(f: (Int, Int) => Int): Unit = {
      var y = 0
      while (y < 4) { var x = 0; while (x < 4) { out(y * 4 + x) = f(x, y); x += 1 }; y += 1 }
    }
    mode match {
      case 0 => // Vertical
        require(n.hasTop, "h264: V pred needs top"); set((x, _) => t(x))
      case 1 => // Horizontal
        require(n.hasLeft, "h264: H pred needs left"); set((_, y) => l(y))
      case 2 => // DC
        val v =
          if (n.hasTop && n.hasLeft) (t(0) + t(1) + t(2) + t(3) + l(0) + l(1) + l(2) + l(3) + 4) >> 3
          else if (n.hasTop) (t(0) + t(1) + t(2) + t(3) + 2) >> 2
          else if (n.hasLeft) (l(0) + l(1) + l(2) + l(3) + 2) >> 2
          else 128
        set((_, _) => v)
      case 3 => // Diagonal-Down-Left
        require(n.hasTop, "h264: DDL pred needs top")
        set { (x, y) =>
          if (x == 3 && y == 3) (t(6) + 3 * t(7) + 2) >> 2
          else (t(x + y) + 2 * t(x + y + 1) + t(x + y + 2) + 2) >> 2
        }
      case 4 => // Diagonal-Down-Right
        require(n.hasTop && n.hasLeft && n.hasCorner, "h264: DDR pred needs all")
        set { (x, y) =>
          if (x > y)
            (pAt(t, c, x - y - 2) + 2 * pAt(t, c, x - y - 1) + t(x - y) + 2) >> 2
          else if (x < y)
            (qAt(l, c, y - x - 2) + 2 * qAt(l, c, y - x - 1) + l(y - x) + 2) >> 2
          else (t(0) + 2 * c + l(0) + 2) >> 2
        }
      case 5 => // Vertical-Right
        require(n.hasTop && n.hasLeft && n.hasCorner, "h264: VR pred needs all")
        set { (x, y) =>
          val z = 2 * x - y
          if (z >= 0 && z % 2 == 0)
            (pAt(t, c, x - (y >> 1) - 1) + pAt(t, c, x - (y >> 1)) + 1) >> 1
          else if (z >= 0)
            (pAt(t, c, x - (y >> 1) - 2) + 2 * pAt(t, c, x - (y >> 1) - 1) +
              pAt(t, c, x - (y >> 1)) + 2) >> 2
          else if (z == -1) (l(0) + 2 * c + t(0) + 2) >> 2
          else (qAt(l, c, y - 2 * x - 1) + 2 * qAt(l, c, y - 2 * x - 2) +
            qAt(l, c, y - 2 * x - 3) + 2) >> 2
        }
      case 6 => // Horizontal-Down
        require(n.hasTop && n.hasLeft && n.hasCorner, "h264: HD pred needs all")
        set { (x, y) =>
          val z = 2 * y - x
          if (z >= 0 && z % 2 == 0)
            (qAt(l, c, y - (x >> 1) - 1) + qAt(l, c, y - (x >> 1)) + 1) >> 1
          else if (z >= 0)
            (qAt(l, c, y - (x >> 1) - 2) + 2 * qAt(l, c, y - (x >> 1) - 1) +
              qAt(l, c, y - (x >> 1)) + 2) >> 2
          else if (z == -1) (t(0) + 2 * c + l(0) + 2) >> 2
          else (pAt(t, c, x - 2 * y - 1) + 2 * pAt(t, c, x - 2 * y - 2) +
            pAt(t, c, x - 2 * y - 3) + 2) >> 2
        }
      case 7 => // Vertical-Left
        require(n.hasTop, "h264: VL pred needs top")
        set { (x, y) =>
          if (y % 2 == 0) (t(x + (y >> 1)) + t(x + (y >> 1) + 1) + 1) >> 1
          else (t(x + (y >> 1)) + 2 * t(x + (y >> 1) + 1) + t(x + (y >> 1) + 2) + 2) >> 2
        }
      case 8 => // Horizontal-Up
        require(n.hasLeft, "h264: HU pred needs left")
        set { (x, y) =>
          val z = x + 2 * y
          if (z < 5 && z % 2 == 0) (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
          else if (z < 5) (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1) + l(y + (x >> 1) + 2) + 2) >> 2
          else if (z == 5) (l(2) + 3 * l(3) + 2) >> 2
          else l(3)
        }
      case m => throw new Mp4Malformed(s"h264: intra4x4 mode $m")
    }
  }

  /** p[i, -1] with i = -1 meaning the corner (VR helper). */
  private def pAt(top: Array[Int], corner: Int, i: Int): Int =
    if (i < 0) corner else top(i)

  /** p[-1, j] with j = -1 meaning the corner (HD helper). */
  private def qAt(left: Array[Int], corner: Int, j: Int): Int =
    if (j < 0) corner else left(j)

  /** Whole-block prediction for I_16x16 luma (modes 0 V / 1 H / 2 DC /
    * 3 Plane, §8.3.3) or 8x8 chroma (modes 0 DC / 1 H / 2 V / 3 Plane,
    * §8.3.4 — note the different mode order). `size` 16 or 8. */
  private def predictBlock(plane: Array[Byte], stride: Int, x: Int, y: Int,
                           size: Int, chroma: Boolean, mode: Int,
                           hasLeft: Boolean, hasTop: Boolean,
                           out: Array[Int]): Unit = {
    def top(i: Int) = plane((y - 1) * stride + x + i) & 0xFF
    def left(j: Int) = plane((y + j) * stride + x - 1) & 0xFF
    def corner = plane((y - 1) * stride + x - 1) & 0xFF
    def fill(f: (Int, Int) => Int): Unit = {
      var j = 0
      while (j < size) {
        var i = 0
        while (i < size) { out(j * size + i) = f(i, j); i += 1 }
        j += 1
      }
    }
    val (vMode, hMode, dcMode, planeMode) =
      if (chroma) (2, 1, 0, 3) else (0, 1, 2, 3)
    if (mode == vMode) {
      require(hasTop, "h264: V pred needs top"); fill((i, _) => top(i))
    } else if (mode == hMode) {
      require(hasLeft, "h264: H pred needs left"); fill((_, j) => left(j))
    } else if (mode == dcMode) {
      if (!chroma) {
        val v =
          if (hasTop && hasLeft)
            ((0 until 16).map(top).sum + (0 until 16).map(left).sum + 16) >> 5
          else if (hasTop) ((0 until 16).map(top).sum + 8) >> 4
          else if (hasLeft) ((0 until 16).map(left).sum + 8) >> 4
          else 128
        fill((_, _) => v)
      } else {
        // chroma DC: per 4x4 quadrant with §8.3.4.1's neighbor choice
        var j = 0
        while (j < size) {
          var i = 0
          while (i < size) {
            val qx = i >> 2; val qy = j >> 2 // quadrant coords (0..1)
            val useTop = (qx + qy) % 2 == 0 || qx > qy // preference order
            val v =
              if (qx == qy) { // main-diagonal quadrants: average both
                if (hasTop && hasLeft)
                  ((0 until 4).map(k => top(qx * 4 + k)).sum +
                    (0 until 4).map(k => left(qy * 4 + k)).sum + 4) >> 3
                else if (hasTop) ((0 until 4).map(k => top(qx * 4 + k)).sum + 2) >> 2
                else if (hasLeft) ((0 until 4).map(k => left(qy * 4 + k)).sum + 2) >> 2
                else 128
              } else if (qx > qy) { // top-right: prefer top
                if (hasTop) ((0 until 4).map(k => top(qx * 4 + k)).sum + 2) >> 2
                else if (hasLeft) ((0 until 4).map(k => left(qy * 4 + k)).sum + 2) >> 2
                else 128
              } else { // bottom-left: prefer left
                if (hasLeft) ((0 until 4).map(k => left(qy * 4 + k)).sum + 2) >> 2
                else if (hasTop) ((0 until 4).map(k => top(qx * 4 + k)).sum + 2) >> 2
                else 128
              }
            val _ = useTop // quadrant logic is explicit above
            out(j * size + i) = v
            i += 1
          }
          j += 1
        }
      }
    } else if (mode == planeMode) {
      require(hasTop && hasLeft, "h264: plane pred needs top+left")
      val half = size / 2
      var hSum = 0; var vSum = 0
      var k = 0
      while (k < half) {
        hSum += (k + 1) * (top(half + k) - (if (half - 2 - k >= 0) top(half - 2 - k) else corner))
        vSum += (k + 1) * (left(half + k) - (if (half - 2 - k >= 0) left(half - 2 - k) else corner))
        k += 1
      }
      val bMul = if (chroma) 34 else 5
      val a = 16 * (left(size - 1) + top(size - 1))
      val b = (bMul * hSum + 32) >> 6
      val c = (bMul * vSum + 32) >> 6
      fill((i, j) => clip1((a + b * (i - (half - 1)) + c * (j - (half - 1)) + 16) >> 5))
    } else throw new Mp4Malformed(s"h264: block pred mode $mode")
  }

  // ───────────────────────────────────────────────────────────────────
  // Slice-level codec: shared per-picture state
  // ───────────────────────────────────────────────────────────────────

  /** Coded-block-pattern me(v), dense subset: a dense intra MB always
    * codes every block, so cbp is always 47 (luma 15 | chroma 2 << 4) —
    * Table 9-4's FIRST entry (codeNum 0 ↔ intra cbp 47), the one
    * mapping certain enough to carry; any other codeNum would need the
    * full 48-entry table and quarantines. */
  private val DenseCbp = 47

  /** Densify: the encoder's subset constraint — every coded block
    * carries ALL its coefficients. Zero levels become 1 (a legal
    * encoder choice; costs fidelity, never conformance), which keeps
    * every coeff_token context in the picture at nC ≥ 8. */
  private def densify(levels: Array[Int]): Array[Int] =
    levels.map(v => if (v == 0) 1 else v)

  /** blkIdx (z-order within the MB) → 4-sample-unit offsets. */
  private val blkX = Array(0, 1, 0, 1, 2, 3, 2, 3, 0, 1, 0, 1, 2, 3, 2, 3)
  private val blkY = Array(0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3)

  /** Decode order index of the absolute 4x4 block (bx, by): raster MBs,
    * z-order blocks within — the top-right availability rule. */
  private def decodeOrd(mbW: Int, bx: Int, by: Int): Int = {
    val mb = (by / 4) * mbW + (bx / 4)
    val i = bx % 4; val j = by % 4
    mb * 16 + (j >> 1) * 8 + (j & 1) * 2 + (i >> 1) * 4 + (i & 1)
  }

  /** Per-picture reconstruction + bookkeeping state (shared verbatim by
    * encoder and decoder — THE exactness device: the encoder mutates
    * this state through the same normative reconstruction calls). */
  private final class Pic(val mbW: Int, val mbH: Int) {
    val cw = mbW * 16; val ch = mbH * 16
    val y = new Array[Byte](cw * ch)
    val cb = new Array[Byte]((cw / 2) * (ch / 2))
    val cr = new Array[Byte]((cw / 2) * (ch / 2))
    /** totalCoeff per 4x4 block (nC bookkeeping); -1 = outside. */
    val nzY = Array.fill(mbH * 4, mbW * 4)(0)
    val nzCb = Array.fill(mbH * 2, mbW * 2)(0)
    val nzCr = Array.fill(mbH * 2, mbW * 2)(0)
    /** intra4x4 pred mode map; 2 (DC) for non-I4x4 intra MBs. */
    val modeY = Array.fill(mbH * 4, mbW * 4)(2)

    def nC(nz: Array[Array[Int]], bx: Int, by: Int, w: Int, h: Int): Int = {
      val nA = if (bx > 0) nz(by)(bx - 1) else -1
      val nB = if (by > 0) nz(by - 1)(bx) else -1
      if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
      else if (nA >= 0) nA else if (nB >= 0) nB else 0
    }
    def nCLuma(bx: Int, by: Int): Int = nC(nzY, bx, by, mbW * 4, mbH * 4)
  }

  /** Add a 4x4 residual to the prediction, clip, land in the plane. */
  private def reconstruct4x4(plane: Array[Byte], stride: Int, x: Int, y: Int,
                             pred: Array[Int], res: Array[Int]): Unit = {
    var j = 0
    while (j < 4) {
      var i = 0
      while (i < 4) {
        plane((y + j) * stride + x + i) =
          clip1(pred(j * 4 + i) + res(j * 4 + i)).toByte
        i += 1
      }
      j += 1
    }
  }

  /** Reconstruct a size×size block from whole-block prediction plus
    * per-4x4 residuals (`res` indexed by 4x4 raster within block). */
  private def reconstructBlock(plane: Array[Byte], stride: Int, x: Int,
                               y: Int, size: Int, pred: Array[Int],
                               res: Array[Array[Int]]): Unit = {
    var j = 0
    while (j < size) {
      var i = 0
      while (i < size) {
        val blk = (j / 4) * (size / 4) + (i / 4)
        val r = res(blk)((j % 4) * 4 + (i % 4))
        plane((y + j) * stride + x + i) = clip1(pred(j * size + i) + r).toByte
        i += 1
      }
      j += 1
    }
  }

  /** Per-MB syntax+reconstruction kernel, driven by either the decoder
    * (levels from the bitstream) or the encoder (levels from its own
    * quantizer) — BOTH land pixels through these same calls. */
  private def reconLumaI4x4(pic: Pic, mbX: Int, mbY: Int, qp: Int,
                            modes: Array[Int],
                            levels: Array[Array[Int]]): Unit = {
    var blk = 0
    while (blk < 16) {
      val bx = mbX * 4 + blkX(blk); val by = mbY * 4 + blkY(blk)
      val x = bx * 4; val y = by * 4
      val myOrd = decodeOrd(pic.mbW, bx, by)
      val hasLeft = bx > 0
      val hasTop = by > 0
      val hasCorner = hasLeft && hasTop
      val hasTopRight = by > 0 && bx + 1 < pic.mbW * 4 &&
        decodeOrd(pic.mbW, bx + 1, by - 1) < myOrd
      val n = new Nbr4(pic.y, pic.cw, x, y, hasLeft, hasTop,
        hasTopRight, hasCorner)
      val pred = new Array[Int](16)
      predict4x4(n, modes(blk), pred)
      val res = inverse4x4(dequant4x4(levels(blk), qp, skipDc = false))
      reconstruct4x4(pic.y, pic.cw, x, y, pred, res)
      blk += 1
    }
  }

  private def reconLumaI16x16(pic: Pic, mbX: Int, mbY: Int, qp: Int,
                              mode: Int, dcScan: Array[Int],
                              ac: Array[Array[Int]]): Unit = {
    val pred = new Array[Int](256)
    predictBlock(pic.y, pic.cw, mbX * 16, mbY * 16, 16, chroma = false,
      mode, hasLeft = mbX > 0, hasTop = mbY > 0, pred)
    val dc = dequantLumaDc(dcScan, qp)
    val res = Array.tabulate(16) { blk =>
      val d = dequant4x4(ac(blk), qp, skipDc = true)
      // res grid is 4x4-raster within the MB; DC grid matches it
      d(0) = dc((blk / 4) * 4 + (blk % 4))
      inverse4x4(d)
    }
    reconstructBlock(pic.y, pic.cw, mbX * 16, mbY * 16, 16, pred, res)
  }

  private def reconChroma(pic: Pic, mbX: Int, mbY: Int, qpc: Int,
                          mode: Int, dcCb: Array[Int], dcCr: Array[Int],
                          acCb: Array[Array[Int]],
                          acCr: Array[Array[Int]]): Unit = {
    val cstride = pic.cw / 2
    def one(plane: Array[Byte], dcRaw: Array[Int],
            ac: Array[Array[Int]]): Unit = {
      val pred = new Array[Int](64)
      predictBlock(plane, cstride, mbX * 8, mbY * 8, 8, chroma = true,
        mode, hasLeft = mbX > 0, hasTop = mbY > 0, pred)
      val dc = dequantChromaDc(dcRaw, qpc)
      val res = Array.tabulate(4) { blk =>
        val d = dequant4x4(ac(blk), qpc, skipDc = true)
        d(0) = dc(blk)
        inverse4x4(d)
      }
      reconstructBlock(plane, cstride, mbX * 8, mbY * 8, 8, pred, res)
    }
    one(pic.cb, dcCb, acCb)
    one(pic.cr, dcCr, acCr)
  }

  // ───────────────────────────────────────────────────────────────────
  // Decoder
  // ───────────────────────────────────────────────────────────────────

  import H264Pcm.Frame

  /** Decode one IDR I-slice NAL under its SPS/PPS; None quarantines
    * anything outside the CAVLC-intra subset. */
  def decode(sps: Sps, pps: Pps, nal: Array[Byte]): Option[Frame] =
    try Some(decodeStrict(sps, pps, nal)) catch {
      case _: Mp4Malformed | _: ArrayIndexOutOfBoundsException => None
    }

  def decodeStrict(sps: Sps, pps: Pps, nal: Array[Byte]): Frame = {
    if (nal.length < 2) throw new Mp4Malformed("slice NAL too short")
    val nalType = nal(0) & 0x1F
    val nalRefIdc = (nal(0) >> 5) & 0x3
    if (nalType != 5 && nalType != 1)
      throw new Mp4Malformed(s"not a coded slice NAL (type $nalType)")
    val idr = nalType == 5
    if (pps.entropyCoding != 0)
      throw new Mp4Malformed("CABAC slice (out of the CAVLC subset)")
    if (sps.chromaFormatIdc != 1)
      throw new Mp4Malformed(s"chroma_format_idc ${sps.chromaFormatIdc} (4:2:0 only)")
    if (sps.frameMbsOnly != 1)
      throw new Mp4Malformed("field/MBAFF coding is out of subset")
    val r = new BitReader(emulationStrip(nal.drop(1)))
    // slice_header (§7.3.3)
    if (r.ue() != 0)
      throw new Mp4Malformed("multi-slice pictures are out of subset")
    val sliceType = r.ue()
    if (sliceType % 5 != 2)
      throw new Mp4Malformed(s"slice_type $sliceType (I only)")
    r.ue() // pic_parameter_set_id
    r.u(sps.log2MaxFrameNumMinus4 + 4) // frame_num
    if (idr) r.ue() // idr_pic_id
    sps.picOrderCntType match {
      case 0 =>
        r.u(sps.log2MaxPocLsbMinus4 + 4)
        if (pps.bottomFieldPicOrder == 1) r.se()
      case 1 => throw new Mp4Malformed("pic_order_cnt_type 1 is out of subset")
      case _ => ()
    }
    if (pps.redundantPicCnt == 1) r.ue()
    if (nalRefIdc != 0) {
      if (idr) { r.u(1); r.u(1) }
      else if (r.u(1) == 1)
        throw new Mp4Malformed("adaptive ref marking is out of subset")
    }
    val sliceQpDelta = r.se()
    // EXACTNESS gate: without an explicit in-bitstream disable, the
    // conformant output is the DEBLOCKED picture — which this decoder
    // does not produce; quarantine rather than return wrong pixels.
    if (pps.deblockingControl == 1) {
      val idc = r.ue()
      if (idc != 1)
        throw new Mp4Malformed("deblocking not disabled (filtered output " +
          "is out of subset)") // idc 0/2 would read alpha/beta next
    } else throw new Mp4Malformed(
      "PPS carries no deblocking control — the filtered output of this " +
        "stream is out of the exact subset")
    var qp = 26 + pps.picInitQpMinus26 + sliceQpDelta
    if (qp < 0 || qp > 51) throw new Mp4Malformed(s"slice QP $qp")
    val pic = new Pic(sps.mbWidth, sps.mbHeight)
    var mb = 0
    while (mb < pic.mbW * pic.mbH) {
      val mbX = mb % pic.mbW; val mbY = mb / pic.mbW
      val t = r.ue()
      if (t == 25) decodePcmMb(r, pic, mbX, mbY)
      else if (t == 0) qp = decodeI4x4Mb(r, pic, pps, mbX, mbY, qp)
      else if (t <= 24) qp = decodeI16x16Mb(r, pic, pps, mbX, mbY, qp, t)
      else throw new Mp4Malformed(s"mb_type $t (inter coding in an I slice)")
      mb += 1
    }
    cropFrame(pic, sps)
  }

  private def decodePcmMb(r: BitReader, pic: Pic, mbX: Int, mbY: Int): Unit = {
    r.align()
    val x = mbX * 16; val y = mbY * 16
    var i = 0
    while (i < 256) {
      pic.y((y + i / 16) * pic.cw + x + i % 16) = r.u(8).toByte; i += 1
    }
    val cs = pic.cw / 2
    i = 0
    while (i < 64) {
      pic.cb((y / 2 + i / 8) * cs + x / 2 + i % 8) = r.u(8).toByte; i += 1
    }
    i = 0
    while (i < 64) {
      pic.cr((y / 2 + i / 8) * cs + x / 2 + i % 8) = r.u(8).toByte; i += 1
    }
    pcmBookkeeping(pic, mbX, mbY)
  }

  /** §9.2.1: an I_PCM macroblock counts 16 for neighbors' nC; its
    * intra4x4 modes derive as DC. */
  private def pcmBookkeeping(pic: Pic, mbX: Int, mbY: Int): Unit = {
    var blk = 0
    while (blk < 16) {
      pic.nzY(mbY * 4 + blkY(blk))(mbX * 4 + blkX(blk)) = 16
      pic.modeY(mbY * 4 + blkY(blk))(mbX * 4 + blkX(blk)) = 2
      blk += 1
    }
    blk = 0
    while (blk < 4) {
      pic.nzCb(mbY * 2 + blk / 2)(mbX * 2 + blk % 2) = 16
      pic.nzCr(mbY * 2 + blk / 2)(mbX * 2 + blk % 2) = 16
      blk += 1
    }
  }

  /** Chroma residual parse shared by both intra MB types; returns the
    * DC + AC level arrays and maintains the chroma nC maps. */
  private def parseChroma(r: BitReader, pic: Pic, mbX: Int, mbY: Int,
                          cbpChroma: Int)
  : (Array[Int], Array[Int], Array[Array[Int]], Array[Array[Int]]) = {
    val dcCb = new Array[Int](4); val dcCr = new Array[Int](4)
    val acCb = Array.fill(4)(new Array[Int](15))
    val acCr = Array.fill(4)(new Array[Int](15))
    if (cbpChroma > 0) {
      readResidualBlock(r, -1, 4, dcCb)
      readResidualBlock(r, -1, 4, dcCr)
    }
    var ci = 0
    while (ci < 2) {
      val (nz, ac) = if (ci == 0) (pic.nzCb, acCb) else (pic.nzCr, acCr)
      var blk = 0
      while (blk < 4) {
        val bx = mbX * 2 + blk % 2; val by = mbY * 2 + blk / 2
        nz(by)(bx) =
          if (cbpChroma == 2)
            readResidualBlock(r, pic.nC(nz, bx, by, pic.mbW * 2, pic.mbH * 2),
              15, ac(blk))
          else 0
        blk += 1
      }
      ci += 1
    }
    (dcCb, dcCr, acCb, acCr)
  }

  private def decodeI4x4Mb(r: BitReader, pic: Pic, pps: Pps,
                           mbX: Int, mbY: Int, qpIn: Int): Int = {
    var qp = qpIn
    val modes = new Array[Int](16)
    var blk = 0
    while (blk < 16) {
      val bx = mbX * 4 + blkX(blk); val by = mbY * 4 + blkY(blk)
      val predMode =
        if (bx == 0 || by == 0) 2
        else math.min(pic.modeY(by)(bx - 1), pic.modeY(by - 1)(bx))
      modes(blk) =
        if (r.u(1) == 1) predMode
        else { val rem = r.u(3); if (rem < predMode) rem else rem + 1 }
      pic.modeY(by)(bx) = modes(blk)
      blk += 1
    }
    val chromaMode = r.ue()
    if (chromaMode > 3) throw new Mp4Malformed(s"chroma mode $chromaMode")
    val code = r.ue()
    // dense subset: only Table 9-4's certain first entry (0 ↔ 47)
    if (code != 0) throw new Mp4Malformed(
      s"h264: cbp codeNum $code needs the full Table 9-4 (out of the " +
        "verifiable subset; dense streams carry cbp 47)")
    val cbpLuma = DenseCbp & 15; val cbpChroma = DenseCbp >> 4
    qp = (qp + r.se() + 52) % 52 // cbp 47 != 0 → mb_qp_delta present
    val levels = Array.fill(16)(new Array[Int](16))
    blk = 0
    while (blk < 16) {
      val bx = mbX * 4 + blkX(blk); val by = mbY * 4 + blkY(blk)
      pic.nzY(by)(bx) =
        if (((cbpLuma >> (blk >> 2)) & 1) == 1)
          readResidualBlock(r, pic.nCLuma(bx, by), 16, levels(blk))
        else 0
      blk += 1
    }
    val (dcCb, dcCr, acCb, acCr) = parseChroma(r, pic, mbX, mbY, cbpChroma)
    reconLumaI4x4(pic, mbX, mbY, qp, modes, levels)
    reconChroma(pic, mbX, mbY, chromaQp(qp, pps.chromaQpIndexOffset),
      chromaMode, dcCb, dcCr, acCb, acCr)
    qp
  }

  private def decodeI16x16Mb(r: BitReader, pic: Pic, pps: Pps,
                             mbX: Int, mbY: Int, qpIn: Int,
                             mbType: Int): Int = {
    val code = mbType - 1
    val predMode = code % 4
    val cbpChroma = (code / 4) % 3
    val cbpLuma = if (code >= 12) 15 else 0
    val chromaMode = r.ue()
    if (chromaMode > 3) throw new Mp4Malformed(s"chroma mode $chromaMode")
    val qp = (qpIn + r.se() + 52) % 52 // mb_qp_delta always present here
    val dcScan = new Array[Int](16)
    readResidualBlock(r, pic.nCLuma(mbX * 4, mbY * 4), 16, dcScan)
    // parse order is z-order; the reconstruction grid is 4x4-raster
    val ac = Array.fill(16)(new Array[Int](15))
    var blk = 0
    while (blk < 16) {
      val bx = mbX * 4 + blkX(blk); val by = mbY * 4 + blkY(blk)
      pic.nzY(by)(bx) =
        if (cbpLuma == 15)
          readResidualBlock(r, pic.nCLuma(bx, by), 15,
            ac(blkY(blk) * 4 + blkX(blk)))
        else 0
      // modeY stays 2 (DC) — the derivation rule for non-I4x4 intra MBs
      blk += 1
    }
    val (dcCb, dcCr, acCb, acCr) = parseChroma(r, pic, mbX, mbY, cbpChroma)
    reconLumaI16x16(pic, mbX, mbY, qp, predMode, dcScan, ac)
    reconChroma(pic, mbX, mbY, chromaQp(qp, pps.chromaQpIndexOffset),
      chromaMode, dcCb, dcCr, acCb, acCr)
    qp
  }

  private def cropFrame(pic: Pic, sps: Sps): Frame = {
    val (w, h) = (sps.width, sps.height)
    if (w > pic.cw || h > pic.ch)
      throw new Mp4Malformed("SPS crop exceeds coded grid")
    def crop(src: Array[Byte], sw: Int, dw: Int, dh: Int): Array[Byte] = {
      val out = new Array[Byte](dw * dh)
      var row = 0
      while (row < dh) {
        System.arraycopy(src, row * sw, out, row * dw, dw); row += 1
      }
      out
    }
    Frame(w, h, crop(pic.y, pic.cw, w, h),
      crop(pic.cb, pic.cw / 2, w / 2, h / 2),
      crop(pic.cr, pic.cw / 2, w / 2, h / 2))
  }

  // ───────────────────────────────────────────────────────────────────
  // Encoder — contains the decoder: every reconstruction below runs the
  // SAME normative dequant/inverse-transform/prediction calls, so the
  // returned Frame is what a conformant decoder must produce, and
  // [[decodeStrict]] of the emitted NAL is asserted byte-exact to it.
  // ───────────────────────────────────────────────────────────────────

  private def pick(seed: Long, salt: Int, n: Int): Int =
    (((seed * 1103515245L + salt.toLong * 12345L + 1013904223L) >>> 16) % n).toInt

  /** Encode one IDR CAVLC I-slice: pixel formulas index row-major over
    * the CODED (MB-aligned) grid; `mbKind(mbIdx)` picks 0 = I_4x4,
    * 1 = I_16x16, 2 = I_PCM; prediction modes are seed-chosen among the
    * modes legal at each position (every mode gets exercised across a
    * corpus). Returns (slice NAL, the normative reconstruction). The
    * matching PPS must carry `picInitQpMinus26` and deblocking control
    * ([[Mp4.writePps]](picInitQpMinus26, 1)). */
  def encodeIdrCavlc(w: Int, h: Int, qp: Int, yAt: Int => Int,
                     cbAt: Int => Int, crAt: Int => Int,
                     mbKind: Int => Int, seed: Long,
                     picInitQpMinus26: Int = 0, frameNum: Int = 0,
                     idrPicId: Int = 0): (Array[Byte], Frame) = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0,
      s"h264: even dimensions required (got ${w}x$h)")
    require(qp >= 0 && qp <= 51, s"h264: QP $qp")
    val mbW = (w + 15) / 16; val mbH = (h + 15) / 16
    val pic = new Pic(mbW, mbH)
    val qpc = chromaQp(qp, 0)
    val bw = new BitWriter
    // slice_header (§7.3.3)
    bw.ue(0) // first_mb_in_slice
    bw.ue(7) // slice_type: I (all slices of the picture)
    bw.ue(0) // pic_parameter_set_id
    bw.u(frameNum & 0xF, 4)
    bw.ue(idrPicId)
    bw.u(0, 1); bw.u(0, 1) // dec_ref_pic_marking (IDR)
    bw.se(qp - 26 - picInitQpMinus26) // slice_qp_delta
    bw.ue(1) // disable_deblocking_filter_idc = 1 → exact pre-filter output
    var mb = 0
    while (mb < mbW * mbH) {
      val mbX = mb % mbW; val mbY = mb / mbW
      // MB (0,0) is ALWAYS I_PCM: its blocks seed every neighbor count
      // at 16, which (with dense coded blocks) keeps every coeff_token
      // context in the picture at nC ≥ 8 — the subset's induction base
      val kind = if (mb == 0) 2 else mbKind(mb)
      kind match {
        case 2 => encodePcmMb(bw, pic, mbX, mbY, yAt, cbAt, crAt)
        case 1 => encodeI16x16Mb(bw, pic, mbX, mbY, qp, qpc, yAt, cbAt,
          crAt, seed + mb)
        case _ => encodeI4x4Mb(bw, pic, mbX, mbY, qp, qpc, yAt, cbAt,
          crAt, seed + mb)
      }
      mb += 1
    }
    bw.stopAndAlign()
    val sps = Sps(66, 30, w, h, mbWidth = mbW, mbHeight = mbH)
    (Array(0x65.toByte) ++ emulationPrevent(bw.toBytes), cropFrame(pic, sps))
  }

  private def encodePcmMb(bw: BitWriter, pic: Pic, mbX: Int, mbY: Int,
                          yAt: Int => Int, cbAt: Int => Int,
                          crAt: Int => Int): Unit = {
    bw.ue(25)
    bw.alignZero()
    val x = mbX * 16; val y = mbY * 16
    var i = 0
    while (i < 256) {
      val v = yAt((y + i / 16) * pic.cw + x + i % 16) & 0xFF
      pic.y((y + i / 16) * pic.cw + x + i % 16) = v.toByte
      bw.u(v, 8); i += 1
    }
    val cs = pic.cw / 2
    i = 0
    while (i < 64) {
      val v = cbAt((y / 2 + i / 8) * cs + x / 2 + i % 8) & 0xFF
      pic.cb((y / 2 + i / 8) * cs + x / 2 + i % 8) = v.toByte
      bw.u(v, 8); i += 1
    }
    i = 0
    while (i < 64) {
      val v = crAt((y / 2 + i / 8) * cs + x / 2 + i % 8) & 0xFF
      pic.cr((y / 2 + i / 8) * cs + x / 2 + i % 8) = v.toByte
      bw.u(v, 8); i += 1
    }
    pcmBookkeeping(pic, mbX, mbY)
  }

  /** Source 4x4 minus prediction → forward transform (raster). */
  private def residualW(src: Array[Int], pred: Array[Int]): Array[Int] =
    forward4x4(Array.tabulate(16)(i => src(i) - pred(i)))

  /** Encoder-side chroma compute shared by both MB kinds: prediction,
    * dense DC/AC quantization, nC bookkeeping, reconstruction. Returns
    * the residual-serializing writeback (cbpChroma is always 2). */
  private def computeChroma(pic: Pic, mbX: Int, mbY: Int, qpc: Int,
                            mode: Int, cbAt: Int => Int, crAt: Int => Int)
  : BitWriter => Unit = {
    val cs = pic.cw / 2
    def one(plane: Array[Byte], at: Int => Int)
    : (Array[Int], Array[Array[Int]]) = {
      val pred = new Array[Int](64)
      predictBlock(plane, cs, mbX * 8, mbY * 8, 8, chroma = true, mode,
        hasLeft = mbX > 0, hasTop = mbY > 0, pred)
      val dcRaw = new Array[Int](4)
      val ac = new Array[Array[Int]](4)
      var blk = 0
      while (blk < 4) {
        val bx = (blk % 2) * 4; val by = (blk / 2) * 4
        val src = Array.tabulate(16)(i =>
          at((mbY * 8 + by + i / 4) * cs + mbX * 8 + bx + i % 4) & 0xFF)
        val p4 = Array.tabulate(16)(i => pred((by + i / 4) * 8 + bx + i % 4))
        val wt = residualW(src, p4)
        dcRaw(blk) = wt(0)
        ac(blk) = densify(quant4x4(wt, qpc, skipDc = true))
        blk += 1
      }
      // 2x2 Hadamard + DC quantization (encoder-side scaling)
      val wd = Array(
        dcRaw(0) + dcRaw(1) + dcRaw(2) + dcRaw(3),
        dcRaw(0) - dcRaw(1) + dcRaw(2) - dcRaw(3),
        dcRaw(0) + dcRaw(1) - dcRaw(2) - dcRaw(3),
        dcRaw(0) - dcRaw(1) - dcRaw(2) + dcRaw(3))
      val qbits = 16 + qpc / 6
      val f = 2L * ((1 << (15 + qpc / 6)) / 3)
      val dc = densify(wd.map(x =>
        (if (x < 0) -((math.abs(x).toLong * quantMF(qpc % 6)(0) + f) >> qbits)
        else (math.abs(x).toLong * quantMF(qpc % 6)(0) + f) >> qbits).toInt))
      (dc, ac)
    }
    val (dcCb, acCb) = one(pic.cb, cbAt)
    val (dcCr, acCr) = one(pic.cr, crAt)
    var blk = 0
    while (blk < 4) {
      val bx = mbX * 2 + blk % 2; val by = mbY * 2 + blk / 2
      pic.nzCb(by)(bx) = 15
      pic.nzCr(by)(bx) = 15
      blk += 1
    }
    reconChroma(pic, mbX, mbY, qpc, mode, dcCb, dcCr, acCb, acCr)
    val writeback: BitWriter => Unit = { w =>
      writeResidualBlock(w, -1, 4, dcCb)
      writeResidualBlock(w, -1, 4, dcCr)
      var ci = 0
      while (ci < 2) {
        val (nz, ac) = if (ci == 0) (pic.nzCb, acCb) else (pic.nzCr, acCr)
        var b = 0
        while (b < 4) {
          val bx = mbX * 2 + b % 2; val by = mbY * 2 + b / 2
          // nC from the map sees only left/top blocks, all final here
          writeResidualBlock(w, nCForWrite(nz, bx, by), 15, ac(b))
          b += 1
        }
        ci += 1
      }
    }
    writeback
  }

  /** Write-time nC: identical derivation to [[Pic.nC]] (left/top blocks
    * precede in both encode-compute and decode-parse order). */
  private def nCForWrite(nz: Array[Array[Int]], bx: Int, by: Int): Int = {
    val nA = if (bx > 0) nz(by)(bx - 1) else -1
    val nB = if (by > 0) nz(by - 1)(bx) else -1
    if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
    else if (nA >= 0) nA else if (nB >= 0) nB else 0
  }

  /** Legal chroma prediction modes at this MB position. */
  private def legalChromaModes(mbX: Int, mbY: Int): Seq[Int] =
    Seq(0) ++ (if (mbX > 0) Seq(1) else Nil) ++
      (if (mbY > 0) Seq(2) else Nil) ++
      (if (mbX > 0 && mbY > 0) Seq(3) else Nil)

  private def encodeI4x4Mb(bw: BitWriter, pic: Pic, mbX: Int, mbY: Int,
                           qp: Int, qpc: Int, yAt: Int => Int,
                           cbAt: Int => Int, crAt: Int => Int,
                           seed: Long): Unit = {
    val modes = new Array[Int](16)
    val levels = Array.fill(16)(new Array[Int](16))
    var blk = 0
    while (blk < 16) {
      val bx = mbX * 4 + blkX(blk); val by = mbY * 4 + blkY(blk)
      val x = bx * 4; val y = by * 4
      val hasLeft = bx > 0; val hasTop = by > 0
      val legal = Seq(2) ++ (if (hasTop) Seq(0, 3, 7) else Nil) ++
        (if (hasLeft) Seq(1, 8) else Nil) ++
        (if (hasLeft && hasTop) Seq(4, 5, 6) else Nil)
      modes(blk) = legal(pick(seed, blk, legal.length))
      pic.modeY(by)(bx) = modes(blk)
      val hasTopRight = by > 0 && bx + 1 < pic.mbW * 4 &&
        decodeOrd(pic.mbW, bx + 1, by - 1) < decodeOrd(pic.mbW, bx, by)
      val n = new Nbr4(pic.y, pic.cw, x, y, hasLeft, hasTop,
        hasTopRight, hasLeft && hasTop)
      val pred = new Array[Int](16)
      predict4x4(n, modes(blk), pred)
      val src = Array.tabulate(16)(i =>
        yAt((y + i / 4) * pic.cw + x + i % 4) & 0xFF)
      levels(blk) = densify(quant4x4(residualW(src, pred), qp, skipDc = false))
      pic.nzY(by)(bx) = 16
      // reconstruct NOW — the next block's prediction reads these pixels
      val res = inverse4x4(dequant4x4(levels(blk), qp, skipDc = false))
      reconstruct4x4(pic.y, pic.cw, x, y, pred, res)
      blk += 1
    }
    val chromaModes = legalChromaModes(mbX, mbY)
    val chromaMode = chromaModes(pick(seed, 77, chromaModes.length))
    val chromaWrite =
      computeChroma(pic, mbX, mbY, qpc, chromaMode, cbAt, crAt)
    val cbpLuma = 15 // dense: every block coded → cbp is always 47
    // serialize: mb_type, 16 mode elements, chroma mode, cbp, qp, residual
    bw.ue(0)
    blk = 0
    while (blk < 16) {
      val bx = mbX * 4 + blkX(blk); val by = mbY * 4 + blkY(blk)
      val predMode =
        if (bx == 0 || by == 0) 2
        else math.min(pic.modeY(by)(bx - 1), pic.modeY(by - 1)(bx))
      if (modes(blk) == predMode) bw.u(1, 1)
      else {
        bw.u(0, 1)
        bw.u(if (modes(blk) < predMode) modes(blk) else modes(blk) - 1, 3)
      }
      blk += 1
    }
    bw.ue(chromaMode)
    bw.ue(0) // coded_block_pattern: codeNum 0 ↔ intra cbp 47 (dense)
    bw.se(0) // mb_qp_delta (cbp != 0)
    blk = 0
    while (blk < 16) {
      if (((cbpLuma >> (blk >> 2)) & 1) == 1) {
        val bx = mbX * 4 + blkX(blk); val by = mbY * 4 + blkY(blk)
        writeResidualBlock(bw, nCForWrite(pic.nzY, bx, by), 16, levels(blk))
      }
      blk += 1
    }
    chromaWrite(bw)
  }

  private def encodeI16x16Mb(bw: BitWriter, pic: Pic, mbX: Int, mbY: Int,
                             qp: Int, qpc: Int, yAt: Int => Int,
                             cbAt: Int => Int, crAt: Int => Int,
                             seed: Long): Unit = {
    val legal = Seq(2) ++ (if (mbY > 0) Seq(0) else Nil) ++
      (if (mbX > 0) Seq(1) else Nil) ++
      (if (mbX > 0 && mbY > 0) Seq(3) else Nil)
    val mode = legal(pick(seed, 5, legal.length))
    val pred = new Array[Int](256)
    predictBlock(pic.y, pic.cw, mbX * 16, mbY * 16, 16, chroma = false,
      mode, hasLeft = mbX > 0, hasTop = mbY > 0, pred)
    val dcRaster = new Array[Int](16)
    val ac = new Array[Array[Int]](16)
    var blk = 0
    while (blk < 16) {
      // 4x4-raster grid within the MB (matches reconLumaI16x16's res)
      val bx = (blk % 4) * 4; val by = (blk / 4) * 4
      val src = Array.tabulate(16)(i =>
        yAt((mbY * 16 + by + i / 4) * pic.cw + mbX * 16 + bx + i % 4) & 0xFF)
      val p4 = Array.tabulate(16)(i => pred((by + i / 4) * 16 + bx + i % 4))
      val wt = residualW(src, p4)
      dcRaster(blk) = wt(0)
      ac(blk) = densify(quant4x4(wt, qp, skipDc = true))
      blk += 1
    }
    // luma DC: forward Hadamard + DC quantization, then zigzag scan
    val wd = hadamard4x4(dcRaster)
    val qbits = 16 + qp / 6
    val f = 2L * ((1 << (15 + qp / 6)) / 3)
    val zd = densify(wd.map(x =>
      (if (x < 0) -((math.abs(x).toLong * quantMF(qp % 6)(0) + f) >> qbits)
      else (math.abs(x).toLong * quantMF(qp % 6)(0) + f) >> qbits).toInt))
    val dcScan = Array.tabulate(16)(s => zd(zigzag4x4(s)))
    val chromaModes = legalChromaModes(mbX, mbY)
    val chromaMode = chromaModes(pick(seed, 77, chromaModes.length))
    // bookkeeping BEFORE chroma (syntax order irrelevant, map order not):
    // the decoder sets nzY during its luma parse, before chroma parse
    blk = 0
    while (blk < 16) {
      val bx = mbX * 4 + blkX(blk); val by = mbY * 4 + blkY(blk)
      pic.nzY(by)(bx) = 15 // dense AC blocks
      pic.modeY(by)(bx) = 2
      blk += 1
    }
    reconLumaI16x16(pic, mbX, mbY, qp, mode, dcScan, ac)
    val chromaWrite =
      computeChroma(pic, mbX, mbY, qpc, chromaMode, cbAt, crAt)
    bw.ue(1 + mode + 4 * 2 + 12) // Intra16x16: cbpChroma 2, cbpLuma 15
    bw.ue(chromaMode)
    bw.se(0) // mb_qp_delta
    writeResidualBlock(bw, nCForWrite(pic.nzY, mbX * 4, mbY * 4), 16, dcScan)
    blk = 0
    while (blk < 16) {
      val bx = mbX * 4 + blkX(blk); val by = mbY * 4 + blkY(blk)
      // z-order serialization over the 4x4-raster ac grid
      writeResidualBlock(bw, nCForWrite(pic.nzY, bx, by), 15,
        ac(blkY(blk) * 4 + blkX(blk)))
      blk += 1
    }
    chromaWrite(bw)
  }

  // ───────────────────────────────────────────────────────────────────
  // Spark surface: synthetic MP4 + CAVLC corpus, end-to-end decode gate
  // ───────────────────────────────────────────────────────────────────

  /** QM — the end-to-end MP4 → H.264 CAVLC-intra decode gate: each
    * document becomes a clip whose one IDR frame mixes I_4x4, I_16x16
    * and I_PCM macroblocks (kind and prediction modes formula-driven,
    * QP sweeping 18..34); the encoder computes the NORMATIVE
    * reconstruction, the chain re-reads the clip through the real MP4
    * demux + SPS/PPS parse + slice decode, and the row REQUIREs the
    * decode BYTE-EXACT to the reconstruction (a divergence is a loud
    * task error, never a wrong hash). The hash-gated columns are all
    * closed-form: dimensions, per-kind MB counts, and the luma sum over
    * the PCM macroblocks (whose pixels pass through verbatim), plus the
    * oracle-asserted `exact` certificate. Scan-side `mapPartitions`,
    * zero shuffle — the 100 TB shape is decode-at-scan-speed. */
  def qmH264Cavlc(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.fanOut(Tables.documents(spark, d).select(col("doc_id")).as[Long])
      .mapPartitions(_.map { id =>
        val w = 16 * (2 + (id % 2)).toInt
        val h = 16 * (2 + (id % 3)).toInt
        val mbW = w / 16
        val nMb = mbW * (h / 16)
        val qp = 18 + (id % 17).toInt
        def kind(mb: Int): Int = ((id + mb) % 4) match {
          case 3 => 2; case 0 => 0; case _ => 1
        }
        val (nal, ref) = encodeIdrCavlc(w, h, qp,
          i => ((id * 31 + i.toLong * 7) % 251).toInt,
          i => ((id * 13 + i.toLong * 5) % 241).toInt,
          i => ((id * 11 + i.toLong * 3) % 239).toInt,
          kind, seed = id * 7919L)
        val mp4 = Mp4.writeMp4(w, h, Seq(Mp4.avccSample(Seq(nal))), Seq(1),
          Mp4.writeSps(w, h), Mp4.writePps(0, 1))
        val decoded = (for {
          t <- Mp4.demux(mp4)
          sps <- t.sps
          s <- t.samples.headOption
          n <- Mp4.nalUnits(mp4, s, t.lengthSize).find(_._1 == 5)
        } yield decodeStrict(sps, Mp4.parsePps(t.ppsNal),
          Array((0x60 | n._1).toByte) ++ n._2))
          .getOrElse(throw new IllegalStateException(
            s"h264 cavlc: clip $id failed the MP4 demux chain"))
        val exact = decoded.y.sameElements(ref.y) &&
          decoded.cb.sameElements(ref.cb) && decoded.cr.sameElements(ref.cr)
        require(exact,
          s"h264 cavlc: decode != normative reconstruction for clip $id")
        val isPcm = (mb: Int) => mb == 0 || (id + mb) % 4 == 3
        val nPcm = (0 until nMb).count(isPcm)
        val nI4 = (1 until nMb).count(mb => (id + mb) % 4 == 0)
        val pcmYSum = (0 until nMb).filter(isPcm).map { mb =>
          val mx = (mb % mbW) * 16; val my = (mb / mbW) * 16
          (0 until 16).flatMap(r => (0 until 16).map(c =>
            (id * 31 + ((my + r).toLong * w + mx + c) * 7) % 251)).sum
        }.sum
        (id, w, h, nMb.toLong, nPcm.toLong, nI4.toLong,
          (nMb - nPcm - nI4).toLong, pcmYSum, exact)
      }).toDF("media_id", "width", "height", "n_mb", "n_pcm", "n_i4",
        "n_i16", "pcm_y_sum", "exact")
      .orderBy("media_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qm_h264_cavlc" -> qmH264Cavlc _)

  val oracles: Map[String, String] = Map(
    // every column recomputed closed-form from doc_id; `exact` is the
    // in-row decode≡reconstruction certificate the oracle asserts
    "qm_h264_cavlc" ->
      ("WITH p AS (SELECT doc_id AS media_id, " +
        "16*(2 + doc_id % 2) AS w, 16*(2 + doc_id % 3) AS h, " +
        "2 + doc_id % 2 AS mbw, " +
        "(2 + doc_id % 2) * (2 + doc_id % 3) AS n_mb FROM documents), " +
        "q AS (SELECT *, " +
        "1 + CAST(list_sum(list_transform(range(1, CAST(n_mb AS BIGINT)), " +
        "mb -> CASE WHEN (media_id + mb) % 4 = 3 THEN 1 ELSE 0 END)) " +
        "AS BIGINT) AS n_pcm, " +
        "CAST(list_sum(list_transform(range(1, CAST(n_mb AS BIGINT)), " +
        "mb -> CASE WHEN (media_id + mb) % 4 = 0 THEN 1 ELSE 0 END)) " +
        "AS BIGINT) AS n_i4, " +
        "CAST(list_sum(list_transform(range(0, CAST(n_mb AS BIGINT)), " +
        "mb -> CASE WHEN mb = 0 OR (media_id + mb) % 4 = 3 THEN " +
        "list_sum(list_transform(range(0, 16), r -> " +
        "list_sum(list_transform(range(0, 16), c -> " +
        "(media_id*31 + (((mb // mbw)*16 + r) * w + (mb % mbw)*16 + c) * 7) " +
        "% 251)))) ELSE 0 END)) AS BIGINT) AS pcm_y_sum FROM p) " +
        "SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, " +
        "CAST(n_mb AS BIGINT) AS n_mb, n_pcm, n_i4, " +
        "CAST(n_mb - n_pcm - n_i4 AS BIGINT) AS n_i16, pcm_y_sum, " +
        "TRUE AS exact FROM q ORDER BY media_id"))
}
