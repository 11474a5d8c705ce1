package graft

import graft.operators.{H264Pcm, Mp4}

/** The H.264 I_PCM slice codec ([[graft.operators.H264Pcm]]), pinned:
  * lossless round trips through a REAL slice-header parse under the
  * parsed SPS/PPS (incl. cropped dimensions and emulation-prevention
  * stress), strict quarantine of everything outside the PCM subset
  * (CABAC, entropy-coded macroblocks, non-I slices, truncation), and
  * the distributed MP4→pixels surface. */
class H264PcmSpec extends SparkSpec {

  private def roundTrip(w: Int, h: Int): Unit = {
    val sps = Mp4.parseSps(Mp4.writeSps(w, h))
    val pps = Mp4.parsePps(Mp4.writePps())
    val cw = 16 * ((w + 15) / 16)
    val nal = H264Pcm.encodeIdrPcm(w, h,
      i => (i * 7 + 3) % 251, i => (i * 5 + 1) % 241, i => (i * 3 + 2) % 239)
    val f = H264Pcm.decodeStrict(sps, pps, nal)
    assert((f.width, f.height) == ((w, h)))
    assert(f.y.length == w * h && f.cb.length == (w / 2) * (h / 2))
    // every cropped pixel equals the encoder's coded-grid formula
    assert(f.y.zipWithIndex.forall { case (b, i) =>
      val (row, cl) = (i / w, i % w)
      (b & 0xFF) == ((row * cw + cl) * 7 + 3) % 251
    }, s"luma mismatch at ${w}x$h")
    assert(f.cr.zipWithIndex.forall { case (b, i) =>
      val (row, cl) = (i / (w / 2), i % (w / 2))
      (b & 0xFF) == ((row * (cw / 2) + cl) * 3 + 2) % 239
    }, s"chroma mismatch at ${w}x$h")
  }

  test("PCM slices round-trip losslessly, 16-aligned and cropped dims") {
    roundTrip(16, 16)
    roundTrip(32, 48)
    roundTrip(18, 26) // crop exercises the padded coded grid
    roundTrip(50, 34)
  }

  test("all-zero planes survive: emulation prevention on PCM bytes") {
    val (w, h) = (16, 16)
    val sps = Mp4.parseSps(Mp4.writeSps(w, h))
    val pps = Mp4.parsePps(Mp4.writePps())
    val nal = H264Pcm.encodeIdrPcm(w, h, _ => 0, _ => 0, _ => 0)
    // the wire must carry no start-code emulation ...
    assert(!nal.sliding(3).exists(t =>
      t(0) == 0 && t(1) == 0 && (t(2) & 0xFF) <= 2),
      "raw zero PCM bytes leaked a start-code emulation onto the wire")
    // ... and still decode back to all zeros
    val f = H264Pcm.decodeStrict(sps, pps, nal)
    assert(f.y.forall(_ == 0) && f.cb.forall(_ == 0) && f.cr.forall(_ == 0))
  }

  test("quarantine: CABAC, entropy-coded MBs, non-I slices, truncation") {
    val sps = Mp4.parseSps(Mp4.writeSps(16, 16))
    val pps = Mp4.parsePps(Mp4.writePps())
    val good = H264Pcm.encodeIdrPcm(16, 16, i => i % 251, i => i % 241, i => i % 239)
    assert(H264Pcm.decode(sps, pps, good).isDefined)
    // CABAC PPS: entropy_coding_mode=1 → quarantine before any parse
    assert(H264Pcm.decode(sps, pps.copy(entropyCoding = 1), good).isEmpty)
    // a P slice header (slice_type 0) must quarantine
    val p = {
      val bw = new Mp4.BitWriter
      bw.ue(0); bw.ue(0) // first_mb, slice_type P
      bw.stopAndAlign()
      Array(0x61.toByte) ++ bw.toBytes
    }
    assert(H264Pcm.decode(sps, pps, p).isEmpty)
    // an entropy-coded macroblock (mb_type != I_PCM) must quarantine
    val entropy = {
      val bw = new Mp4.BitWriter
      bw.ue(0); bw.ue(7); bw.ue(0) // first_mb, I, pps id
      bw.u(0, 4); bw.ue(0) // frame_num, idr_pic_id
      bw.u(0, 1); bw.u(0, 1) // dec_ref_pic_marking
      bw.se(0) // slice_qp_delta
      bw.ue(3) // mb_type I_16x16 — NOT PCM
      bw.stopAndAlign()
      Array(0x65.toByte) ++ bw.toBytes
    }
    assert(H264Pcm.decode(sps, pps, entropy).isEmpty)
    // truncated PCM payload
    assert(H264Pcm.decode(sps, pps, good.dropRight(40)).isEmpty)
    // a non-slice NAL
    assert(H264Pcm.decode(sps, pps, Mp4.writeSps(16, 16)).isEmpty)
  }

  test("distributed MP4 -> SPS/PPS -> PCM pixels matches the generator closed form") {
    val stats = H264Pcm.h264PcmStats(
      H264Pcm.syntheticMp4Pcm(spark, "/root/testdata/sf0.001")).collect()
    assert(stats.nonEmpty)
    val r = stats.find(_.getLong(0) == 4L).get
    // id=4: w=16+2*(4%9)=24, h=16+2*(4%5)=24, n=1+4%3=2, cw=32
    assert(r.getInt(1) == 24 && r.getInt(2) == 24 && r.getLong(3) == 2L)
    val expY = (for (f <- 0 until 2; row <- 0 until 24; cl <- 0 until 24)
      yield ((4L * 31 + f * 17 + (row * 32 + cl) * 7) % 251)).sum
    assert(r.getLong(4) == expY, s"y_sum ${r.getLong(4)} != $expY")
  }
}
