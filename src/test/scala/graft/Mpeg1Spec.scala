package graft

import graft.operators.Mpeg1
import graft.operators.Mpeg1.{Frame, Mpeg1Codec}

/** The MPEG-1 intra codec, pinned without Spark: bitstream structure,
  * VLC table consistency, the bit-exact DC-only contract that
  * `qm_mpeg1_stats`'s closed-form oracle rides, the lossy AC bound that
  * `qm_mpeg1_roundtrip` certifies in-plan, and quarantine strictness. */
class Mpeg1Spec extends org.scalatest.funsuite.AnyFunSuite {

  private def flatFrame(w: Int, h: Int, yv: Int => Int, cbv: Int => Int, crv: Int => Int): Frame = {
    val mbw = w / 16
    Frame(
      Array.tabulate(w * h) { i => yv((i / w / 16) * mbw + (i % w) / 16) },
      Array.tabulate(w * h / 4) { i => cbv((i / (w / 2) / 8) * mbw + (i % (w / 2)) / 8) },
      Array.tabulate(w * h / 4) { i => crv((i / (w / 2) / 8) * mbw + (i % (w / 2)) / 8) })
  }

  test("flat-macroblock frames survive encode→decode BIT-exact (DC step is fixed at 8)") {
    val w = 48; val h = 32
    val frames = (0 until 3).map { f =>
      flatFrame(w, h, mb => 16 + (f * 13 + mb * 5) % 200,
        mb => 20 + (f * 11 + mb * 2) % 200, mb => 25 + (f * 3 + mb * 7) % 200)
    }
    val dec = Mpeg1Codec.decode(Mpeg1Codec.encode(w, h, qscale = 4, frames))
    assert(dec.isDefined)
    assert(dec.get.width == w && dec.get.height == h && dec.get.frames.size == 3)
    dec.get.frames.zip(frames).foreach { case (got, want) =>
      assert(got.y.sameElements(want.y), "luma plane must be bit-exact")
      assert(got.cb.sameElements(want.cb), "Cb plane must be bit-exact")
      assert(got.cr.sameElements(want.cr), "Cr plane must be bit-exact")
    }
  }

  test("all VLC code spaces are prefix-free (the property the decoder's bit walk relies on)") {
    def assertPrefixFree(codes: Seq[String], what: String): Unit =
      for (a <- codes; b <- codes if a != b)
        assert(!b.startsWith(a), s"$what: '$a' is a prefix of '$b'")
    // AC space: run-level codes + EOB + escape (sign bits follow, so the
    // codes themselves must be prefix-free)
    assertPrefixFree(Mpeg1.AcCodes.map(_._3) ++ Seq("10", "000001"), "dct_coeff_next")
    // no duplicate (run, level) rows either
    assert(Mpeg1.AcCodes.map(t => (t._1, t._2)).distinct.size == Mpeg1.AcCodes.size)
    // motion_code space (B.4): zero + 16 signed magnitudes
    assertPrefixFree(Mpeg1.motionCodes, "motion_code")
    assert(Mpeg1.motionCodes.size == 33 && Mpeg1.motionCodes.distinct.size == 33)
    // B.4's +1 is '010' — the anchor row that pins the derived prefixes
    assert(Mpeg1.MotionPrefix(1) == "01")
    // P macroblock types (B.2b) and coded_block_pattern (B.3 subset)
    assertPrefixFree(Mpeg1.PMbTypes.map(_._1), "macroblock_type (P)")
    assertPrefixFree(Mpeg1.CbpCodes.map(_._2), "coded_block_pattern")
    assert(Mpeg1.CbpCodes.map(_._1).distinct.size == Mpeg1.CbpCodes.size)
    assert(Mpeg1.CbpCodes.forall { case (v, _) => v >= 1 && v <= 63 })
  }

  test("textured frames reconstruct within the pinned quantization bound (AC path: VLCs, escapes, oddification)") {
    // worst-observed error across the generator's id space is what the
    // self-certifying query row asserts per record — pin it here with
    // the exact constant the row uses
    var worst = 0
    (0L until 64L).foreach { id =>
      val (w, h, nf) = (16 * (1 + (id % 2)).toInt, 16, (1 + id % 2).toInt)
      val cw = w / 2
      val frames = (0 until nf).map { f =>
        Frame(
          Array.tabulate(w * h)(i => ((id * 31 + f * 17 + (i % w) * 3 + (i / w) * 5) % 224 + 16).toInt),
          Array.tabulate(w * h / 4)(i => ((id * 13 + f * 7 + (i % cw) * 5 + (i / cw) * 3) % 224 + 16).toInt),
          Array.tabulate(w * h / 4)(i => ((id * 19 + f * 23 + (i % cw) * 7 + (i / cw) * 11) % 224 + 16).toInt))
      }
      val dec = Mpeg1Codec.decode(Mpeg1Codec.encode(w, h, Mpeg1.TexQscale, frames))
      assert(dec.isDefined, s"id=$id must decode")
      dec.get.frames.zip(frames).foreach { case (got, want) =>
        got.y.zip(want.y).foreach { case (a, b) => worst = worst max math.abs(a - b) }
        got.cb.zip(want.cb).foreach { case (a, b) => worst = worst max math.abs(a - b) }
        got.cr.zip(want.cr).foreach { case (a, b) => worst = worst max math.abs(a - b) }
      }
    }
    assert(worst <= Mpeg1.TexMaxErr,
      s"worst reconstruction error $worst exceeds the pinned bound ${Mpeg1.TexMaxErr}")
    assert(worst > 0, "textured frames must actually exercise the lossy AC path")
  }

  test("streams carry real MPEG-1 start codes in order (sequence, GOP, picture, slice, end)") {
    val p = Mpeg1Codec.encode(16, 16, 4, Seq(flatFrame(16, 16, _ => 99, _ => 42, _ => 17)))
    def sc(i: Int): Int = // byte-aligned start codes by construction
      if (p(i) == 0 && p(i + 1) == 0 && p(i + 2) == 1) p(i + 3) & 0xFF else -1
    assert(sc(0) == 0xB3, "stream must open with a sequence header")
    val codes = p.indices.dropRight(3).map(sc).filter(_ >= 0)
    assert(codes.containsSlice(Seq(0xB3, 0xB8, 0x00, 0x01)), s"header chain wrong: $codes")
    assert(codes.last == 0xB7, "stream must close with sequence_end_code")
  }

  test("quarantine: truncation, bit corruption, P-pictures, and garbage all answer None") {
    val good = Mpeg1Codec.encode(32, 16, 4,
      Seq(flatFrame(32, 16, mb => 30 + mb, mb => 60 + mb, mb => 90 + mb)))
    assert(Mpeg1Codec.decode(good).isDefined)
    assert(Mpeg1Codec.decode(good.take(good.length / 2)).isEmpty, "truncated body")
    assert(Mpeg1Codec.decode(good.take(6)).isEmpty, "truncated header")
    assert(Mpeg1Codec.decode("not a stream".getBytes).isEmpty, "garbage")
    // flip picture_coding_type from I (001) to P (010): the picture
    // header starts right after the GOP start code's 4 bytes + 4 byte
    // GOP body; find it via the 00 00 01 00 start code instead
    val picAt = good.indices.find(i => i + 3 < good.length &&
      good(i) == 0 && good(i + 1) == 0 && good(i + 2) == 1 && good(i + 3) == 0).get
    val asP = good.clone()
    // temporal_reference is 10 bits after the 4-byte start code; the 3
    // type bits follow: bits 10..12 of byte picAt+4 .. — flip via int ops
    // byte layout: [tr9..tr2][tr1 tr0 t2 t1 t0 vbv...]: second byte's
    // bits 5..3 hold the type; I=001 → P=010
    asP(picAt + 5) = ((asP(picAt + 5) & ~(7 << 3)) | (2 << 3)).toByte
    assert(Mpeg1Codec.decode(asP).isEmpty,
      "a P-picture with no preceding reference frame must quarantine")
    val asB = good.clone()
    asB(picAt + 5) = ((asB(picAt + 5) & ~(7 << 3)) | (3 << 3)).toByte
    assert(Mpeg1Codec.decode(asB).isEmpty,
      "a B-picture without both reference anchors must quarantine")
    val asD = good.clone()
    asD(picAt + 5) = ((asD(picAt + 5) & ~(7 << 3)) | (4 << 3)).toByte
    assert(Mpeg1Codec.decode(asD).isEmpty, "D-pictures are outside the subset and must quarantine")
  }

  test("zero-motion pred-m P-picture reproduces the intra reference exactly (differential vs the intra path)") {
    val w = 48; val h = 32
    val mbs = (w / 16) * (h / 16)
    val fr = flatFrame(w, h, mb => 40 + mb * 7, mb => 70 + mb * 5, mb => 100 + mb * 3)
    // [I(F), P(all pred-m, MV 0, no residual)] must decode to [F, F] —
    // and byte-for-byte equal what decoding [I(F), I(F)] yields
    val inter = Mpeg1Codec.decode(Mpeg1Codec.encodeSeq(w, h, Seq(
      Mpeg1.IPic(4, fr),
      Mpeg1.PPic(2, fullPel = true, fCode = 1, Seq.fill(mbs)(Mpeg1.MbPred(0, 0, None)))))).get
    val intra = Mpeg1Codec.decode(Mpeg1Codec.encode(w, h, 4, Seq(fr, fr))).get
    assert(inter.frames.size == 2 && intra.frames.size == 2)
    inter.frames.zip(intra.frames).foreach { case (a, b) =>
      assert(a.y.sameElements(b.y) && a.cb.sameElements(b.cb) && a.cr.sameElements(b.cr),
        "P-predicted frame must match the intra-coded frame bit-for-bit")
    }
  }

  test("planted motion + flat residuals + skips decode bit-exact (the qm_mpeg1_p_stats recurrence)") {
    // mirrors the corpus generator + the oracle recurrence; ids cover
    // every geometry, skip phase, VLC-range and escape-range delta
    def delta(m: Long): Int = { val r = (m % 19).toInt; if (r == 9) 10 else r - 9 }
    (0L until 48L).foreach { id =>
      val w = 16 * (1 + (id % 3)).toInt; val h = 16 * (1 + (id % 2)).toInt
      val nf = (1 + id % 3).toInt
      val mbw = w / 16; val mbh = h / 16; val nmb = mbw * mbh
      def skip(f: Int, mb: Int) = mbw == 3 && mb % 3 == 1 && (id + f + mb) % 2 == 0
      // expected per-MB values by the recurrence
      val vy = Array.ofDim[Int](nf, nmb); val vcb = Array.ofDim[Int](nf, nmb); val vcr = Array.ofDim[Int](nf, nmb)
      for (mb <- 0 until nmb) {
        vy(0)(mb) = ((id * 7 + mb * 5) % 130 + 60).toInt
        vcb(0)(mb) = ((id * 3 + mb * 2) % 130 + 62).toInt
        vcr(0)(mb) = ((id * 5 + mb * 7) % 130 + 64).toInt
      }
      for (f <- 1 until nf; mb <- 0 until nmb) {
        if (skip(f, mb)) {
          vy(f)(mb) = vy(f - 1)(mb); vcb(f)(mb) = vcb(f - 1)(mb); vcr(f)(mb) = vcr(f - 1)(mb)
        } else {
          val s = (mb + 1) % nmb
          vy(f)(mb) = vy(f - 1)(s) + delta(id * 11 + f * 7 + mb * 3)
          vcb(f)(mb) = vcb(f - 1)(s) + delta(id * 13 + f * 5 + mb * 7)
          vcr(f)(mb) = vcr(f - 1)(s) + delta(id * 17 + f * 3 + mb * 11)
        }
      }
      // encode the same stream the Spark corpus builds
      val frame0 = flatFrame(w, h, vy(0)(_), vcb(0)(_), vcr(0)(_))
      val pPics = (1 until nf).map { f =>
        Mpeg1.PPic(2, fullPel = true, fCode = 3, (0 until nmb).map { mb =>
          if (skip(f, mb)) Mpeg1.MbSkip
          else {
            val s = (mb + 1) % nmb
            Mpeg1.MbPred((s % mbw - mb % mbw) * 16, (s / mbw - mb / mbw) * 16,
              Some((delta(id * 11 + f * 7 + mb * 3), delta(id * 13 + f * 5 + mb * 7),
                delta(id * 17 + f * 3 + mb * 11))))
          }
        })
      }
      val dec = Mpeg1Codec.decode(Mpeg1Codec.encodeSeq(w, h, Mpeg1.IPic(4, frame0) +: pPics))
      assert(dec.isDefined, s"id=$id must decode")
      assert(dec.get.frames.size == nf)
      dec.get.frames.zipWithIndex.foreach { case (got, f) =>
        for (i <- 0 until w * h) {
          val mb = (i / w / 16) * mbw + (i % w) / 16
          assert(got.y(i) == vy(f)(mb), s"id=$id f=$f luma pixel $i: ${got.y(i)} != ${vy(f)(mb)}")
        }
        for (i <- 0 until w * h / 4) {
          val mb = (i / (w / 2) / 8) * mbw + (i % (w / 2)) / 8
          assert(got.cb(i) == vcb(f)(mb), s"id=$id f=$f Cb pixel $i")
          assert(got.cr(i) == vcr(f)(mb), s"id=$id f=$f Cr pixel $i")
        }
      }
      // at least some ids must actually exercise the skip path
      if (id == 2 || id == 5) assert((1 until nf).exists(f => (0 until nmb).exists(skip(f, _))),
        s"id=$id was chosen to carry a skipped macroblock")
    }
  }

  test("half-pel prediction interpolates with the spec's round-away '//' (luma h/v/diagonal + chroma)") {
    val w = 32; val h = 32; val cw = w / 2
    // gradients so interpolation actually averages distinct neighbours
    val ref = Frame(
      Array.tabulate(w * h)(i => 20 + (i % w) * 3 + (i / w) * 5),
      Array.tabulate(w * h / 4)(i => 10 + (i % cw) * 4 + (i / cw) * 2),
      Array.tabulate(w * h / 4)(i => 30 + (i % cw) * 2 + (i / cw) * 4))
    // MB0: (+1,0) right half-pel; MB1: (0,+1) down half-pel;
    // MB2: (+1,-1) diagonal half-pel; MB3: (-2,-2) full-pel (-1,-1)
    val mvs = Seq((1, 0), (0, 1), (1, -1), (-2, -2))
    val dec = Mpeg1Codec.decode(Mpeg1Codec.encodeSeq(w, h, Seq(
      Mpeg1.IPic(4, ref), // gradient I-frame is lossy — predict from the DECODED reference
      Mpeg1.PPic(2, fullPel = false, fCode = 1, mvs.map { case (x, y) => Mpeg1.MbPred(x, y, None) }))))
    assert(dec.isDefined)
    val r = dec.get.frames.head // decoded reference (qscale-4 lossy)
    val got = dec.get.frames(1)
    def interp(p: Array[Int], stride: Int, x: Int, y: Int, dhx: Int, dhy: Int): Int = {
      val ix = x + Math.floorDiv(dhx, 2); val iy = y + Math.floorDiv(dhy, 2)
      val hx = dhx - 2 * Math.floorDiv(dhx, 2); val hy = dhy - 2 * Math.floorDiv(dhy, 2)
      val a = p(iy * stride + ix)
      if (hx == 0 && hy == 0) a
      else if (hy == 0) (a + p(iy * stride + ix + 1) + 1) >> 1
      else if (hx == 0) (a + p((iy + 1) * stride + ix) + 1) >> 1
      else (a + p(iy * stride + ix + 1) + p((iy + 1) * stride + ix) + p((iy + 1) * stride + ix + 1) + 2) >> 2
    }
    for (mb <- 0 to 3; py <- 0 until 16; px <- 0 until 16) {
      val (dhx, dhy) = mvs(mb)
      val x = (mb % 2) * 16 + px; val y = (mb / 2) * 16 + py
      assert(got.y(y * w + x) == interp(r.y, w, x, y, dhx, dhy),
        s"luma MB$mb ($px,$py): half-pel interpolation mismatch")
    }
    for (mb <- 0 to 3; py <- 0 until 8; px <- 0 until 8) {
      val (dhx, dhy) = mvs(mb)
      val x = (mb % 2) * 8 + px; val y = (mb / 2) * 8 + py
      assert(got.cb(y * cw + x) == interp(r.cb, cw, x, y, dhx / 2, dhy / 2),
        s"Cb MB$mb: chroma vector must be the luma vector halved toward zero")
      assert(got.cr(y * cw + x) == interp(r.cr, cw, x, y, dhx / 2, dhy / 2), s"Cr MB$mb")
    }
  }

  test("intra macroblocks inside a P-picture decode with the spec's predictor resets") {
    val w = 32; val h = 16
    val fr = flatFrame(w, h, mb => 50 + mb * 9, mb => 80 + mb * 4, mb => 110 + mb * 6)
    val dec = Mpeg1Codec.decode(Mpeg1Codec.encodeSeq(w, h, Seq(
      Mpeg1.IPic(4, fr),
      Mpeg1.PPic(4, fullPel = true, fCode = 1, Seq(
        Mpeg1.MbPred(0, 0, None),
        Mpeg1.MbIntra(Array.fill(256)(77), Array.fill(64)(88), Array.fill(64)(99)))))))
    assert(dec.isDefined, "intra-in-P stream must decode")
    val got = dec.get.frames(1)
    for (py <- 0 until 16; px <- 0 until 16) {
      assert(got.y(py * w + px) == fr.y(py * w + px), "MB0 is a zero-motion copy")
      assert(got.y(py * w + 16 + px) == 77, "MB1 is intra-coded flat 77")
    }
    for (py <- 0 until 8; px <- 0 until 8) {
      assert(got.cb(py * (w / 2) + 8 + px) == 88 && got.cr(py * (w / 2) + 8 + px) == 99)
    }
  }

  test("interpolated B-picture between identical anchors reproduces the anchor bit-exactly") {
    val w = 32; val h = 32
    val mbs = (w / 16) * (h / 16)
    val fr = flatFrame(w, h, mb => 60 + mb * 9, mb => 70 + mb * 5, mb => 80 + mb * 3)
    // decode order [I(F), P(=F, zero-motion), B(interp, MV 0, no residual)];
    // interp of two identical planes is (a+a+1)>>1 = a — bit-exact
    val dec = Mpeg1Codec.decode(Mpeg1Codec.encodeSeq(w, h, Seq(
      Mpeg1.IPic(4, fr),
      Mpeg1.PPic(2, fullPel = true, fCode = 1, Seq.fill(mbs)(Mpeg1.MbPred(0, 0, None))),
      Mpeg1.BPic(2, fullPelFwd = true, fCodeFwd = 1, fullPelBwd = true, fCodeBwd = 1,
        Seq.fill(mbs)(Mpeg1.BPred(Some((0, 0)), Some((0, 0)), None)))))).get
    assert(dec.frames.size == 3)
    dec.frames.foreach { got =>
      assert(got.y.sameElements(fr.y) && got.cb.sameElements(fr.cb) && got.cr.sameElements(fr.cr),
        "all three frames must equal the flat anchor bit-for-bit")
    }
  }

  test("decoded frames re-sort into display order by temporal_reference (I B P, not I P B)") {
    val w = 16; val h = 16
    val fr = flatFrame(w, h, _ => 100, _ => 110, _ => 120)
    // decode order [I(A), P(A+5), B(fwd MV 0, no residual → exactly A)];
    // display order must be [A, A, A+5] — an unsorted decoder would
    // emit [A, A+5, A]
    val dec = Mpeg1Codec.decode(Mpeg1Codec.encodeSeq(w, h, Seq(
      Mpeg1.IPic(4, fr),
      Mpeg1.PPic(2, fullPel = true, fCode = 1, Seq(Mpeg1.MbPred(0, 0, Some((5, 5, 5))))),
      Mpeg1.BPic(2, fullPelFwd = true, fCodeFwd = 1, fullPelBwd = true, fCodeBwd = 1,
        Seq(Mpeg1.BPred(Some((0, 0)), None, None)))))).get
    assert(dec.frames.size == 3)
    assert(dec.frames(0).y.forall(_ == 100) && dec.frames(1).y.forall(_ == 100),
      "display slots 0 and 1 are the I-picture and the forward-only B copy of it")
    assert(dec.frames(2).y.forall(_ == 105),
      "display slot 2 is the P-picture (anchor decoded before the B, displayed after it)")
  }

  test("B-skip repeats the previous MB's direction and vectors — identical to the explicit macroblock") {
    val w = 48; val h = 16 // mbw 3: skip legal only at the interior column
    val fr = flatFrame(w, h, mb => 60 + mb * 9, mb => 70 + mb * 5, mb => 80 + mb * 3)
    val anchors = Seq(
      Mpeg1.IPic(4, fr),
      Mpeg1.PPic(2, fullPel = true, fCode = 1,
        (0 until 3).map(mb => Mpeg1.MbPred(0, 0, Some((mb + 1, mb + 2, mb + 3))))))
    // MB0: interpolated, fwd MV (+16,0), bwd MV (0,0) — skip at MB1 must
    // repeat BOTH directions with BOTH predictors unchanged
    val mb0 = Mpeg1.BPred(Some((16, 0)), Some((0, 0)), None)
    val mb2 = Mpeg1.BPred(Some((-32, 0)), None, Some((4, 5, 6)))
    val skipped = Mpeg1Codec.decode(Mpeg1Codec.encodeSeq(w, h,
      anchors :+ Mpeg1.BPic(2, fullPelFwd = true, fCodeFwd = 3, fullPelBwd = true, fCodeBwd = 1,
        Seq(mb0, Mpeg1.BSkip, mb2)))).get
    val explicit = Mpeg1Codec.decode(Mpeg1Codec.encodeSeq(w, h,
      anchors :+ Mpeg1.BPic(2, fullPelFwd = true, fCodeFwd = 3, fullPelBwd = true, fCodeBwd = 1,
        Seq(mb0, Mpeg1.BPred(Some((16, 0)), Some((0, 0)), None), mb2)))).get
    assert(skipped.frames.size == 3 && explicit.frames.size == 3)
    skipped.frames.zip(explicit.frames).foreach { case (a, b) =>
      assert(a.y.sameElements(b.y) && a.cb.sameElements(b.cb) && a.cr.sameElements(b.cr),
        "skip and its explicit twin must decode identically")
    }
  }

  test("B-picture encode guards: needs two anchors; no first/last-slice or after-intra skips; tref permutation enforced") {
    val w = 48; val h = 16
    val fr = flatFrame(w, h, mb => 60 + mb, mb => 70 + mb, mb => 80 + mb)
    def bpic(mbs: Seq[Mpeg1.BMb]) =
      Mpeg1.BPic(2, fullPelFwd = true, fCodeFwd = 1, fullPelBwd = true, fCodeBwd = 1, mbs)
    val anchors = Seq(
      Mpeg1.IPic(4, fr),
      Mpeg1.PPic(2, fullPel = true, fCode = 1, Seq.fill(3)(Mpeg1.MbPred(0, 0, None))))
    val okMb = Mpeg1.BPred(Some((0, 0)), None, None)
    // B before its second anchor
    intercept[IllegalArgumentException] {
      Mpeg1Codec.encodeSeq(w, h, Seq(anchors.head, bpic(Seq.fill(3)(okMb))))
    }
    // first / last MB of a slice skipped
    intercept[IllegalArgumentException] {
      Mpeg1Codec.encodeSeq(w, h, anchors :+ bpic(Seq(Mpeg1.BSkip, okMb, okMb)))
    }
    intercept[IllegalArgumentException] {
      Mpeg1Codec.encodeSeq(w, h, anchors :+ bpic(Seq(okMb, okMb, Mpeg1.BSkip)))
    }
    // skip directly after an intra macroblock
    intercept[IllegalArgumentException] {
      Mpeg1Codec.encodeSeq(w, h, anchors :+ bpic(Seq(
        Mpeg1.BIntra(Array.fill(256)(77), Array.fill(64)(88), Array.fill(64)(99)),
        Mpeg1.BSkip, okMb)))
    }
    // decoder-side: duplicate temporal references must quarantine — zero
    // out the SECOND picture's 10 tref bits (two pictures then claim
    // display slot 0, so the per-GOP permutation check fails)
    val good = Mpeg1Codec.encodeSeq(w, h, anchors :+ bpic(Seq.fill(3)(okMb)))
    assert(Mpeg1Codec.decode(good).isDefined)
    val picAt = good.indices.filter(i => i + 3 < good.length &&
      good(i) == 0 && good(i + 1) == 0 && good(i + 2) == 1 && good(i + 3) == 0)
    assert(picAt.size == 3, "stream must carry three pictures")
    val dup = good.clone()
    dup(picAt(1) + 4) = 0
    dup(picAt(1) + 5) = (dup(picAt(1) + 5) & 0x3F).toByte
    assert(Mpeg1Codec.decode(dup).isEmpty, "duplicate temporal_reference must quarantine")
  }

  test("planted bidirectional motion decodes bit-exact in display order (the qm_mpeg1_b_stats recurrence)") {
    // mirrors the corpus generator and the oracle's closed form over
    // every geometry × mode × coded/uncoded combination
    def d(m: Long): Int = { val r = (m % 19).toInt; if (r == 9) 10 else r - 9 }
    (0L until 48L).foreach { id =>
      val w = 16 * (1 + (id % 3)).toInt; val h = 16 * (1 + (id % 2)).toInt
      val nf = (3 + id % 2).toInt
      val mbw = w / 16; val mbh = h / 16; val nmb = mbw * mbh
      val vI = Array.tabulate(3, nmb)((p, mb) => p match {
        case 0 => ((id * 9 + mb * 5) % 130 + 60).toInt
        case 1 => ((id * 3 + mb * 4) % 130 + 62).toInt
        case 2 => ((id * 7 + mb * 6) % 130 + 64).toInt
      })
      val vP = Array.tabulate(3, nmb)((p, mb) => p match {
        case 0 => vI(0)(mb) + d(id * 11 + mb * 3 + 1)
        case 1 => vI(1)(mb) + d(id * 13 + mb * 7 + 2)
        case 2 => vI(2)(mb) + d(id * 17 + mb * 11 + 3)
      })
      def vB(f: Int, p: Int, mb: Int): Int = {
        val row = mb / mbw; val colM = mb % mbw
        val sF = row * mbw + (mbw - 1 - colM)
        val sB = (mbh - 1 - row) * mbw + colM
        val base = ((id + f * 5 + mb * 7) % 3).toInt match {
          case 0 => vI(p)(sF)
          case 1 => vP(p)(sB)
          case _ => (vI(p)(sF) + vP(p)(sB) + 1) >> 1
        }
        val coded = (id * 3 + f + mb) % 3 != 0
        if (!coded) base
        else base + (p match {
          case 0 => d(id * 13 + f * 7 + mb * 5)
          case 1 => d(id * 7 + f * 11 + mb * 3)
          case 2 => d(id * 19 + f * 5 + mb * 13)
        })
      }
      // the same stream the Spark corpus builds
      val frame0 = flatFrame(w, h, vI(0)(_), vI(1)(_), vI(2)(_))
      val pPic = Mpeg1.PPic(2, fullPel = true, fCode = 1, (0 until nmb).map { mb =>
        Mpeg1.MbPred(0, 0, Some((d(id * 11 + mb * 3 + 1), d(id * 13 + mb * 7 + 2), d(id * 17 + mb * 11 + 3))))
      })
      val bPics = (1 to nf - 2).map { f =>
        Mpeg1.BPic(2, fullPelFwd = true, fCodeFwd = 3, fullPelBwd = true, fCodeBwd = 2,
          (0 until nmb).map { mb =>
            val row = mb / mbw; val colM = mb % mbw
            val fwd = ((mbw - 1 - 2 * colM) * 16, 0)
            val bwd = (0, (mbh - 1 - 2 * row) * 16)
            val deltas =
              if ((id * 3 + f + mb) % 3 == 0) None
              else Some((d(id * 13 + f * 7 + mb * 5), d(id * 7 + f * 11 + mb * 3), d(id * 19 + f * 5 + mb * 13)))
            ((id + f * 5 + mb * 7) % 3).toInt match {
              case 0 => Mpeg1.BPred(Some(fwd), None, deltas)
              case 1 => Mpeg1.BPred(None, Some(bwd), deltas)
              case _ => Mpeg1.BPred(Some(fwd), Some(bwd), deltas)
            }
          })
      }
      val dec = Mpeg1Codec.decode(Mpeg1Codec.encodeSeq(w, h, Mpeg1.IPic(4, frame0) +: pPic +: bPics))
      assert(dec.isDefined, s"id=$id must decode")
      assert(dec.get.frames.size == nf)
      // display order: I, B(1..nf-2), P
      def wantMb(f: Int, p: Int, mb: Int): Int =
        if (f == 0) vI(p)(mb) else if (f == nf - 1) vP(p)(mb) else vB(f, p, mb)
      dec.get.frames.zipWithIndex.foreach { case (got, f) =>
        for (i <- 0 until w * h) {
          val mb = (i / w / 16) * mbw + (i % w) / 16
          assert(got.y(i) == wantMb(f, 0, mb), s"id=$id f=$f luma pixel $i: ${got.y(i)} != ${wantMb(f, 0, mb)}")
        }
        for (i <- 0 until w * h / 4) {
          val mb = (i / (w / 2) / 8) * mbw + (i % (w / 2)) / 8
          assert(got.cb(i) == wantMb(f, 1, mb), s"id=$id f=$f Cb pixel $i")
          assert(got.cr(i) == wantMb(f, 2, mb), s"id=$id f=$f Cr pixel $i")
        }
      }
    }
  }

  test("escape coding round-trips the full level range (±255) — large-coefficient path") {
    // a high-contrast block forces large AC levels through the 16-bit
    // escape forms at qscale 1
    val w = 16; val h = 16
    val y = Array.tabulate(w * h)(i => if ((i % w) % 2 == 0) 0 else 255)
    val fr = Frame(y, Array.fill(w * h / 4)(128), Array.fill(w * h / 4)(128))
    val dec = Mpeg1Codec.decode(Mpeg1Codec.encode(w, h, 1, Seq(fr)))
    assert(dec.isDefined, "the checkerboard stream must decode")
    // qscale 1 on a two-level pattern: reconstruction stays within a
    // loose bound (the pattern is exactly representable by 4 DCT lines)
    val err = dec.get.frames.head.y.zip(y).map { case (a, b) => math.abs(a - b) }.max
    assert(err <= 16, s"checkerboard max error $err")
  }
}
