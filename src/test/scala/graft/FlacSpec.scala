package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Flac
import graft.operators.Flac._

/** The FLAC fixed-predictor codec ([[graft.operators.Flac]]), pinned at
  * three levels:
  *  1. integrity primitives against PUBLISHED check values — CRC-8
  *     poly 0x07 and CRC-16 poly 0x8005 of "123456789" (0xF4 / 0xFEE8),
  *     plus coded-number boundary round-trips — so a transcription slip
  *     in the one table-free spec arithmetic cannot survive;
  *  2. encoder-contains-decoder exactness: decode(encode(pcm)) sample-
  *     exact across channels, bit depths, block tails, every stereo
  *     decorrelation mode, wasted bits, the Rice raw-bits escape, both
  *     Rice methods, and the LPC bitstream path;
  *  3. quarantine: any byte flip inside frame data must be caught by
  *     the CRC-8/CRC-16/MD5 chain and return None — never a wrong
  *     sample, never a throw. */
class FlacSpec extends AnyFunSuite {

  // ── 1. integrity canaries ─────────────────────────────────────────

  private val check = "123456789".getBytes("US-ASCII")

  test("CRC-8 poly 0x07 matches the published check value") {
    assert(Flac.crc8(check, 0, check.length) == 0xF4)
    assert(Flac.crc8(Array[Byte](), 0, 0) == 0x00)
  }

  test("CRC-16 poly 0x8005 matches the published check value") {
    assert(Flac.crc16(check, 0, check.length) == 0xFEE8)
    assert(Flac.crc16(Array[Byte](), 0, 0) == 0x0000)
  }

  test("coded numbers round-trip at every width boundary") {
    val edges = Seq(0L, 1L, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
      0x1FFFFF, 0x200000, 0x3FFFFFF, 0x4000000, 0x7FFFFFFFL, 0x80000000L,
      (1L << 36) - 1)
    for (v <- edges) {
      val bytes = Flac.codedNumberBytes(v)
      val br = new Flac.BitReader(bytes)
      assert(Flac.readCodedNumber(br) == v, s"coded number $v")
    }
    // continuation byte without its 10-prefix must be rejected
    val broken = Flac.codedNumberBytes(0x800)
    broken(1) = (broken(1) ^ 0x40).toByte
    intercept[RuntimeException] {
      Flac.readCodedNumber(new Flac.BitReader(broken))
    }
  }

  // ── 2. round-trip exactness ───────────────────────────────────────

  private def rng(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)
      .map(_ >>> 16).drop(1)

  private def roundTrip(pcm: Array[Array[Int]], bps: Int, blockSize: Int,
                        stereo: StereoMode = Auto,
                        lpc: Boolean = false): Unit = {
    val bytes = Flac.encode(44100, bps, pcm, blockSize, stereo, lpc)
    val dec = Flac.decode(bytes).getOrElse(fail(s"quarantined (bps=$bps)"))
    assert(dec.sampleRate == 44100 && dec.bps == bps)
    assert(dec.channels == pcm.length)
    for (c <- pcm.indices)
      assert(dec.samples(c).toSeq == pcm(c).toSeq,
        s"channel $c differs (bps=$bps block=$blockSize stereo=$stereo)")
  }

  test("smooth mono signals round-trip and compress (fixed predictors)") {
    for (n <- Seq(1, 5, 16, 64, 100, 257)) {
      val pcm = Array(Array.tabulate(n)(i => 100 + 7 * i - (i * i) / 50))
      val bytes = Flac.encode(44100, 16, pcm, blockSize = 64)
      assert(Flac.decodeStrict(bytes).samples(0).toSeq == pcm(0).toSeq)
      if (n >= 64) assert(bytes.length < 2 * n, s"n=$n: no compression")
    }
  }

  test("noise, constants, and extreme values round-trip (verbatim/escape)") {
    val r = rng(7)
    val noise = Array.tabulate(200)(_ => (r.next() % 30000).toInt)
    roundTrip(Array(noise), 16, 64)
    roundTrip(Array(Array.fill(100)(-1234)), 16, 64) // constant blocks
    // alternating extremes force the Rice raw-bits escape
    val extreme = Array.tabulate(128)(i => if (i % 2 == 0) 32767 else -32768)
    roundTrip(Array(extreme), 16, 64)
  }

  test("every stereo decorrelation mode round-trips exactly") {
    val r = rng(13)
    val left = Array.tabulate(150)(i => 500 + 3 * i + (r.next() % 7).toInt)
    val right = Array.tabulate(150)(i => left(i) - 40 + (r.next() % 5).toInt)
    for (mode <- Seq(Independent, LeftSide, RightSide, MidSide, Auto))
      roundTrip(Array(left, right), 16, 64, stereo = mode)
    // odd left+right sums exercise the dropped-low-bit mid/side restore
    val l2 = Array.tabulate(64)(i => 2 * i + 1)
    val r2 = Array.tabulate(64)(i => -3 * i)
    roundTrip(Array(l2, r2), 16, 64, stereo = MidSide)
  }

  test("wasted bits, LPC path, many channels, and odd bit depths") {
    // all samples share 4 trailing zero bits → wasted-bits path
    val shifted = Array(Array.tabulate(100)(i => (i - 50) * 16))
    roundTrip(shifted, 16, 64)
    // explicit LPC subframe emission (order-2, coefficients [2,-1])
    val smooth = Array(Array.tabulate(200)(i => 3 * i + 11))
    roundTrip(smooth, 16, 64, lpc = true)
    // >2 channels stay independent
    val tri = Array.tabulate(3, 90)((c, i) => c * 1000 + 5 * i)
    roundTrip(tri, 16, 32)
    // 8-bit and 24-bit depths; 24-bit extremes need 5-bit Rice params
    roundTrip(Array(Array.tabulate(80)(i => i - 40)), 8, 32)
    val r24 = rng(99)
    val wide = Array.tabulate(128)(_ => (r24.next() % 8000000).toInt)
    roundTrip(Array(wide), 24, 64)
  }

  test("fixture corpus decodes to the closed-form PCM") {
    for (id <- Seq(0L, 1L, 2L, 5L, 17L, 1234L)) {
      val (rate, ch, frames) = Flac.fixtureParams(id)
      val pcm = Array.tabulate(ch, frames)((c, i) => Flac.pcmAt(id, c, i))
      val bytes = Flac.encode(rate, 16, pcm, blockSize = 64,
        lpcOrder2 = id % 5 == 0)
      val dec = Flac.decodeStrict(bytes)
      assert(dec.sampleRate == rate && dec.channels == ch)
      for (c <- 0 until ch)
        assert(dec.samples(c).toSeq == pcm(c).toSeq, s"id=$id channel $c")
      assert(bytes.length < 2 * ch * frames + 64, s"id=$id: no compression")
    }
  }

  // ── 3. quarantine ─────────────────────────────────────────────────

  test("any byte flip inside frame data quarantines as None") {
    val pcm = Array(Array.tabulate(120)(i => 50 * i % 3001 - 1500))
    val bytes = Flac.encode(8000, 16, pcm, blockSize = 64)
    val frameStart = 4 + 4 + 34 // marker + block header + STREAMINFO
    for (pos <- frameStart until bytes.length) {
      val mut = bytes.clone()
      mut(pos) = (mut(pos) ^ 0x55).toByte
      assert(Flac.decode(mut).isEmpty, s"flip at byte $pos not caught")
    }
  }

  test("tampered STREAMINFO MD5, truncation, and garbage quarantine") {
    val pcm = Array(Array.tabulate(64)(i => 7 * i))
    val bytes = Flac.encode(8000, 16, pcm, blockSize = 64)
    val md5Tamper = bytes.clone()
    md5Tamper(4 + 4 + 18 + 3) = (md5Tamper(4 + 4 + 18 + 3) ^ 0x01).toByte
    assert(Flac.decode(md5Tamper).isEmpty, "MD5 tamper not caught")
    for (cut <- Seq(0, 3, 10, 41, bytes.length - 1))
      assert(Flac.decode(bytes.take(cut)).isEmpty, s"truncation at $cut")
    assert(Flac.decode("OggS not flac at all".getBytes("US-ASCII")).isEmpty)
  }

  test("the query row matches its own closed form at sf0.001") {
    val spark = SharedSpark.spark
    val rows = Flac.qmFlacStats(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    for (row <- rows.take(20)) {
      val id = row.getLong(0)
      val (rate, ch, frames) = Flac.fixtureParams(id)
      assert(row.getLong(1) == rate && row.getLong(2) == ch &&
        row.getLong(3) == frames)
      var want = 0L
      for (c <- 0 until ch; i <- 0 until frames) want += Flac.pcmAt(id, c, i)
      assert(row.getLong(4) == want, s"amp_sum for id=$id")
    }
  }
}
