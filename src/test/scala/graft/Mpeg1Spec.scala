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
    assert(Mpeg1Codec.decode(asP).isEmpty, "P-pictures are outside the intra subset and must quarantine")
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
