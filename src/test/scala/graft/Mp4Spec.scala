package graft

import graft.operators.Mp4
import graft.operators.Multimodal.VideoRecord

/** The MP4/ISOBMFF demuxer + H.264 SPS codec ([[graft.operators.Mp4]]),
  * pinned: SPS exp-Golomb round trips (cropping, emulation prevention,
  * High-profile and POC-type branches), box-walk strictness (overruns,
  * largesize, missing structure → quarantine), sample-table resolution
  * (multi-chunk stsc, absent stss = all sync), and the distributed
  * demux/keyframe-extraction surface. */
class Mp4Spec extends SparkSpec {
  import spark.implicits._

  test("SPS round-trips dimensions exactly, with and without cropping") {
    for ((w, h) <- Seq((64, 48), (18, 26), (1920, 1080), (322, 242), (2, 2))) {
      val sps = Mp4.parseSps(Mp4.writeSps(w, h))
      assert((sps.width, sps.height) == ((w, h)), s"${w}x$h")
      assert(sps.profileIdc == 66)
    }
    intercept[IllegalArgumentException] { Mp4.writeSps(17, 16) } // odd
  }

  test("emulation prevention inserts and strips symmetrically") {
    val patterns = Seq(
      Array[Byte](0, 0, 0),
      Array[Byte](0, 0, 1, 0, 0, 2, 0, 0, 3),
      Array[Byte](0, 0, 0, 0, 0),
      Array.tabulate(64)(i => (i % 4).toByte))
    for (p <- patterns) {
      val wire = Mp4.emulationPrevent(p)
      // no 00 00 0x (x <= 3) sequence may survive on the wire
      assert(!wire.sliding(3).exists(t =>
        t(0) == 0 && t(1) == 0 && (t(2) & 0xFF) <= 2),
        s"start-code emulation on the wire: ${wire.mkString(",")}")
      assert(Mp4.emulationStrip(wire).toSeq == p.toSeq)
    }
  }

  test("High-profile SPS (chroma idc, bit depths, scaling skip) and POC types parse") {
    // hand-build a High (100) SPS: the branch parseSps must walk
    val bw = new Mp4.BitWriter
    bw.u(100, 8); bw.u(0, 8); bw.u(40, 8) // profile High, level 4.0
    bw.ue(0) // sps id
    bw.ue(1) // chroma_format_idc 4:2:0
    bw.ue(0); bw.ue(0) // bit depths
    bw.u(0, 1) // transform bypass
    bw.u(1, 1) // seq_scaling_matrix_present_flag
    for (_ <- 0 until 8) bw.u(0, 1) // no per-list overrides
    bw.ue(0) // log2_max_frame_num_minus4
    bw.ue(0) // pic_order_cnt_type 0
    bw.ue(0) // log2_max_pic_order_cnt_lsb_minus4
    bw.ue(2); bw.u(0, 1)
    bw.ue(128 / 16 - 1); bw.ue(64 / 16 - 1) // 128x64
    bw.u(1, 1); bw.u(1, 1) // frame_mbs_only, direct_8x8
    bw.u(0, 1); bw.u(0, 1) // no crop, no vui
    bw.stopAndAlign()
    val nal = Array(0x67.toByte) ++ Mp4.emulationPrevent(bw.toBytes)
    val sps = Mp4.parseSps(nal)
    assert((sps.profileIdc, sps.width, sps.height) == ((100, 128, 64)))
  }

  test("a written MP4 demuxes back exactly: dims via SPS, samples, syncs, offsets") {
    val (w, h) = (50, 38)
    val sps = Mp4.writeSps(w, h)
    val pps = Mp4.writePps()
    val samples = (0 until 5).map { s =>
      Mp4.avccSample(Seq(
        Array((if (s % 2 == 0) 0x65 else 0x41).toByte) ++
          Array.tabulate(10 + s)(i => ((s * 7 + i) % 251).toByte)))
    }
    val mp4 = Mp4.writeMp4(w, h, samples, Seq(1, 3, 5), sps, pps)
    val t = Mp4.demuxStrict(mp4)
    assert(t.codec == "avc1")
    assert(t.sps.map(s => (s.width, s.height)) == Some((w, h)))
    assert(t.samples.size == 5)
    assert(t.samples.map(_.sync) == Seq(true, false, true, false, true))
    assert(t.samples.map(_.size) == samples.map(_.length.toLong))
    // NAL classification through the resolved offsets
    val types = t.samples.flatMap(s => Mp4.nalUnits(mp4, s, t.lengthSize).map(_._1))
    assert(types == Seq(5, 1, 5, 1, 5))
    // payload bytes come back exactly (offset resolution is byte-true)
    val first = Mp4.nalUnits(mp4, t.samples.head, t.lengthSize).head._2
    assert(first.toSeq == Array.tabulate(10)(i => ((i * 1 + 0) % 251).toByte).toSeq
      .map(identity)) // s=0: bytes (0*7+i)%251
  }

  test("absent stss means every sample is sync; multi-chunk stsc resolves") {
    val (w, h) = (32, 32)
    val samples = (0 until 4).map(s => Mp4.avccSample(Seq(
      Array(0x65.toByte) ++ Array.fill(8)(s.toByte))))
    val mp4 = Mp4.writeMp4(w, h, samples, Seq.empty,
      Mp4.writeSps(w, h), Mp4.writePps())
    val t = Mp4.demuxStrict(mp4)
    assert(t.samples.forall(_.sync), "no stss → all sync per §8.6.2")

    // a REAL multi-chunk layout: 5 uneven samples over 2 chunks (3+2)
    // → stsc carries two runs and stco two offsets; resolved samples
    // must be byte-identical to the 1-chunk layout's
    val five = (0 until 5).map(s => Mp4.avccSample(Seq(
      Array((if (s == 0) 0x65 else 0x41).toByte) ++
        Array.tabulate(6 + s)(i => ((s * 13 + i) % 251).toByte))))
    val one = Mp4.writeMp4(w, h, five, Seq(1), Mp4.writeSps(w, h),
      Mp4.writePps(), chunks = 1)
    val split = Mp4.writeMp4(w, h, five, Seq(1), Mp4.writeSps(w, h),
      Mp4.writePps(), chunks = 2)
    val (t1, t2) = (Mp4.demuxStrict(one), Mp4.demuxStrict(split))
    assert(t2.samples.size == 5)
    assert(t1.samples.map(_.size) == t2.samples.map(_.size))
    def payloads(bytes: Array[Byte], t: Mp4.Mp4Track): Seq[Seq[Byte]] =
      t.samples.map(s => Mp4.nalUnits(bytes, s, t.lengthSize).head._2.toSeq)
    assert(payloads(one, t1) == payloads(split, t2),
      "chunking is a table fact — resolved sample bytes must not change")
    // per-chunk contiguity: within each chunk offsets advance by size
    assert(t2.samples(1).offset == t2.samples(0).offset + t2.samples(0).size)
  }

  test("malformed structure quarantines: truncation, overrun, bad avcC, missing boxes") {
    val good = Mp4.writeMp4(32, 32,
      Seq(Mp4.avccSample(Seq(Array(0x65.toByte) ++ Array.fill(6)(1.toByte)))),
      Seq(1), Mp4.writeSps(32, 32), Mp4.writePps())
    assert(Mp4.demux(good).isDefined)
    // truncated anywhere in moov → None, never a wrong answer
    assert(Mp4.demux(good.dropRight(7)).isEmpty)
    assert(Mp4.demux(good.take(16)).isEmpty)
    assert(Mp4.demux(Array[Byte](1, 2, 3)).isEmpty)
    // a box whose declared size overruns its parent
    val overrun = good.clone()
    overrun(0) = 0x7F.toByte // ftyp size becomes enormous
    assert(Mp4.demux(overrun).isEmpty)
    // corrupt the avcC configurationVersion
    val idx = {
      val needle = "avcC".getBytes("US-ASCII")
      good.indices.find(i => i + 4 <= good.length &&
        good.slice(i, i + 4).sameElements(needle)).get + 4
    }
    val badAvcc = good.clone(); badAvcc(idx) = 9
    assert(Mp4.demux(badAvcc).isEmpty)
    // an mdat sample pointing past EOF: shrink the mdat body by
    // truncating the file right after moov start is covered above;
    // instead blow up a stsz entry
    val szIdx = {
      val needle = "stsz".getBytes("US-ASCII")
      good.indices.find(i => i + 4 <= good.length &&
        good.slice(i, i + 4).sameElements(needle)).get
    }
    val badSz = good.clone(); badSz(szIdx + 4 + 12) = 0x7F.toByte
    assert(Mp4.demux(badSz).isEmpty, "sample overrunning the file must quarantine")
  }

  test("fuzz: seeded corruption never yields a WRONG demux — only None or the exact truth") {
    val (w, h) = (34, 22)
    val samples = (0 until 4).map(s => Mp4.avccSample(Seq(
      Array((if (s % 2 == 0) 0x65 else 0x41).toByte) ++
        Array.tabulate(9 + s)(i => ((s * 11 + i * 3) % 251).toByte))))
    val good = Mp4.writeMp4(w, h, samples, Seq(1, 3), Mp4.writeSps(w, h),
      Mp4.writePps(), chunks = 2)
    val truth = Mp4.demuxStrict(good)
    def facts(t: Mp4.Mp4Track) =
      (t.codec, t.sps.map(s => (s.width, s.height)),
        t.samples.map(s => (s.offset, s.size, s.sync)))
    val rng = new scala.util.Random(0xC0DEC)
    val mdatBody = (truth.samples.head.offset,
      truth.samples.last.offset + truth.samples.last.size)
    var quarantined = 0
    for (_ <- 0 until 300) {
      val fuzzed = good.clone()
      val touched = Seq.newBuilder[Int]
      for (_ <- 0 to rng.nextInt(3)) {
        val at = rng.nextInt(fuzzed.length)
        touched += at
        fuzzed(at) = rng.nextInt(256).toByte
      }
      Mp4.demux(fuzzed) match {
        case None => quarantined += 1
        case Some(t) =>
          // SAFETY: whatever survived must resolve only in-bounds ranges
          assert(t.samples.forall(s => s.offset >= 0 &&
            s.offset + s.size <= fuzzed.length),
            "a surviving demux resolved an out-of-bounds sample")
          // EXACTNESS: if every corruption landed in sample PAYLOAD
          // bytes, the metadata path is untouched and the demux must
          // equal the truth bit for bit
          if (touched.result().forall(at =>
              at >= mdatBody._1 && at < mdatBody._2))
            assert(facts(t) == facts(truth),
              "payload-only corruption disturbed the sample table")
      }
    }
    assert(quarantined > 0, "300 corruptions never tripped the quarantine")
  }

  test("distributed demux + keyframe extraction over the synthetic corpus") {
    val vids = Mp4.syntheticMp4(spark, "/root/testdata/sf0.001")
    val stats = Mp4.mp4Demux(vids).collect()
    assert(stats.nonEmpty)
    // spot-check one clip against the generator's closed form
    val r = stats.find(_.getLong(0) == 7L).get
    // id=7: w=18+2*(7%15)=32, h=16+2*(7%11)=30, n=2+7%5=4, stride=1+7%3=2
    assert(r.getInt(2) == 32 && r.getInt(3) == 30)
    assert(r.getLong(4) == 4L && r.getLong(5) == 2L)
    val keys = Mp4.sampleMp4Keyframes(vids).collect()
    assert(keys.nonEmpty)
    // every extracted payload matches the generator formula
    val k = keys.filter(_._1 == 7L)
    assert(k.map(_._2).toSeq == Seq(1L, 3L), "id=7 stride=2 → samples 1 and 3 sync")
    val body = k.head._3
    assert(body.zipWithIndex.forall { case (b, i) =>
      (b & 0xFF) == ((7 * 31 + 0 * 101 + i * 7) % 251) })
  }
}
