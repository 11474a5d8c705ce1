package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, FloatType, ArrayType}
import graft.operators.Multimodal
import graft.operators.Multimodal.{AudioRecord, AviMjpegCodec, ImageIoCodec, ImageRecord, MediaRecord, PpmCodec, StubCodec, VideoRecord, WavCodec, Y4mCodec}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, sfTiny).cache()

  test("payload is a real binary column with the stub header intact") {
    val df = media.toDF()
    assert(df.schema("payload").dataType == BinaryType)
    val first = df.orderBy("media_id").select("payload").head.getAs[Array[Byte]](0)
    assert(first.take(4).sameElements(StubCodec.Magic))
  }

  test("decode round-trips the encoded dimensions") {
    val decoded = Multimodal.decodeMeta(media).collect()
    assert(decoded.length == media.count())
    decoded.foreach { d =>
      assert(d.width >= 64 && d.width < 192)
      assert(d.height >= 48 && d.height < 144)
      assert(d.n_frames >= 1)
    }
    // every video got its frame count, every image/audio exactly 1
    assert(decoded.filter(_.media_type == "video").forall(_.n_frames >= 8))
    assert(decoded.filter(_.media_type != "video").forall(_.n_frames == 1))
  }

  test("corrupt payloads are dropped, not crashed on") {
    val corrupt = Seq(
      MediaRecord(900L, "image", "not-a-grft-header".getBytes),
      MediaRecord(901L, "image", Array[Byte](1, 2))).toDS()
    assert(Multimodal.decodeMeta(corrupt).count() == 0)
    assert(Multimodal.decodeMeta(media.union(corrupt)).count() == media.count())
  }

  test("feature extraction yields normalized fixed-width float vectors") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.schema("features").dataType == ArrayType(FloatType, containsNull = false))
    val rows = feats.collect()
    rows.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3, "histogram must be L1-normalized")
    }
    // deterministic: same input -> same features
    val again = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    rows.foreach(f => assert(again(f.media_id) == f.features.toSeq))
  }

  test("frame sampling explodes videos into per-frame rows") {
    val frames = Multimodal.sampleFrames(media, stride = 4)
    val perVideo = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
    val decoded = Multimodal.decodeMeta(media).filter(_.media_type == "video")
      .collect().map(d => d.media_id -> d.n_frames).toMap
    perVideo.collect().foreach { r =>
      val id = r.getLong(0)
      if (decoded.contains(id)) {
        val expected = (0 until decoded(id) by 4).size
        assert(r.getLong(1) == expected, s"video $id")
      }
    }
  }

  // ---- real PPM (P6) codec path ----

  test("PpmCodec encodes a well-formed P6 that round-trips exactly") {
    val p = PpmCodec.encode(5, 4, i => (i * 3 + 1) % 256)
    // header is genuine NetPBM: external tools would accept this payload
    assert(new String(p.take(3), "US-ASCII") == "P6\n")
    val Some((w, h, off)) = PpmCodec.decodeHeader(p)
    assert((w, h) == (5, 4))
    assert(p.length - off == 3 * 5 * 4)
    (0 until 3 * 5 * 4).foreach(i => assert((p(off + i) & 0xFF) == (i * 3 + 1) % 256))
  }

  test("PpmCodec rejects corrupt payloads: bad magic, bad maxval, truncated body") {
    assert(PpmCodec.decodeHeader("P5\n2 2\n255\n".getBytes ++ new Array[Byte](12)).isEmpty)
    assert(PpmCodec.decodeHeader("P6\n2 2\n65535\n".getBytes ++ new Array[Byte](12)).isEmpty)
    assert(PpmCodec.decodeHeader("P6\n2 2\n255\n".getBytes ++ new Array[Byte](11)).isEmpty)
    assert(PpmCodec.decodeHeader(Array.emptyByteArray).isEmpty)
    // adversarial dims must not overflow 3*w*h into a "valid" payload
    assert(PpmCodec.decodeHeader(
      "P6\n99999999 99999999\n255\n".getBytes ++ new Array[Byte](32)).isEmpty)
    // a non-whitespace byte after maxval is not a separator
    assert(PpmCodec.decodeHeader("P6\n2 2\n255X".getBytes ++ new Array[Byte](12)).isEmpty)
    // a digit string past Int.MaxValue must fail the dimension cap, not
    // wrap into a small "valid" width (12884901889 = 3 * 2^32 + 1 → Int 1)
    assert(PpmCodec.decodeHeader(
      "P6\n12884901889 2\n255\n".getBytes ++ new Array[Byte](32)).isEmpty)
  }

  test("channel sums match a directly computed reference") {
    val p = PpmCodec.encode(7, 3, i => (i * 11) % 251)
    val Some((_, _, rs, gs, bs)) = PpmCodec.channelSums(p)
    def ref(c: Int) = (0 until 7 * 3).map(px => (3 * px + c) * 11 % 251).sum.toLong
    assert((rs, gs, bs) == (ref(0), ref(1), ref(2)))
  }

  test("nearest-neighbor resize: dimensions change, same-size is identity, pixels map back") {
    val src = PpmCodec.encode(8, 6, i => (i * 5) % 256)
    val Some(same) = PpmCodec.resize(src, 8, 6)
    assert(same.sameElements(src))
    val Some(half) = PpmCodec.resize(src, 4, 3)
    val Some((w, h, off)) = PpmCodec.decodeHeader(half)
    assert((w, h) == (4, 3))
    val Some((_, _, srcOff)) = PpmCodec.decodeHeader(src)
    // each target pixel equals the source pixel at the floor-mapped coords
    for (y <- 0 until 3; x <- 0 until 4; c <- 0 until 3) {
      val sx = x * 8 / 4; val sy = y * 6 / 3
      assert(half(off + 3 * (y * 4 + x) + c) == src(srcOff + 3 * (sy * 8 + sx) + c))
    }
  }

  test("distributed image pipeline: synthesize -> resize -> decode stays byte-exact") {
    val images = Multimodal.syntheticPpm(spark, sfTiny)
    val stats = Multimodal.imageStats(images).collect()
    assert(stats.length == images.count())
    // resize every image to 4x3 and re-decode: all dims land, none dropped
    val resized = Multimodal.imageStats(Multimodal.resizeImages(images, 4, 3)).collect()
    assert(resized.length == stats.length)
    assert(resized.forall(s => s.width == 4 && s.height == 3))
    // corrupt P6 payloads are dropped, not crashed on
    val corrupt = Seq(ImageRecord(990L, "P6\n2 2\n255".getBytes),
      ImageRecord(991L, Array[Byte]('P', '6'))).toDS()
    assert(Multimodal.imageStats(corrupt).count() == 0)
  }

  // ---- real compressed-image codec (JDK ImageIO) ----

  test("ImageIoCodec: PNG encode -> decode is pixel-exact (lossless)") {
    val p = ImageIoCodec.encode(9, 5, "png", i => (i * 7 + 3) % 256)
    // genuine PNG signature: external tools would accept this payload
    assert((p(0) & 0xFF) == 0x89 && new String(p.slice(1, 4), "US-ASCII") == "PNG")
    val Some((w, h, rs, gs, bs)) = ImageIoCodec.channelSums(p)
    assert((w, h) == (9, 5))
    def ref(c: Int) = (0 until 9 * 5).map(px => ((3 * px + c) * 7 + 3) % 256).sum.toLong
    assert((rs, gs, bs) == (ref(0), ref(1), ref(2)))
  }

  test("ImageIoCodec: PPM -> PNG -> PPM round-trip is byte-exact") {
    val src = PpmCodec.encode(8, 6, i => (i * 13 + 5) % 251)
    val Some(png) = ImageIoCodec.fromPpm(src, "png")
    val Some(back) = ImageIoCodec.toPpm(png)
    assert(back.sameElements(src))
  }

  test("ImageIoCodec: JPEG decode recovers exact dims and approximate pixels") {
    val p = ImageIoCodec.encode(16, 12, "jpg", i => ((i / 3) * 2) % 256)
    val Some((w, h, rs, gs, bs)) = ImageIoCodec.channelSums(p)
    assert((w, h) == (16, 12))
    // lossy: sums land near the source (smooth gradient, generous bound)
    val exact = (0 until 16 * 12).map(px => (px * 2) % 256).sum.toLong
    Seq(rs, gs, bs).foreach(s => assert(math.abs(s - exact) < exact / 10 + 200, s"$s vs $exact"))
  }

  test("ImageIoCodec: BMP decode is pixel-exact; corrupt payloads are dropped") {
    val p = ImageIoCodec.encode(4, 4, "bmp", i => (i * 31) % 256)
    val Some((w, h, rs, _, _)) = ImageIoCodec.channelSums(p)
    assert((w, h) == (4, 4))
    assert(rs == (0 until 16).map(px => (3 * px * 31) % 256).sum.toLong)
    assert(ImageIoCodec.channelSums("not an image at all".getBytes).isEmpty)
    assert(ImageIoCodec.channelSums(Array.emptyByteArray).isEmpty)
    // truncated PNG: header recognized, stream dies mid-decode -> dropped
    val png = ImageIoCodec.encode(9, 5, "png", _ => 7)
    assert(ImageIoCodec.channelSums(png.take(png.length / 2)).isEmpty)
  }

  test("distributed compressed pipeline: synthesize PNG -> ImageIO decode, none dropped") {
    val images = Multimodal.syntheticPng(spark, sfTiny)
    val stats = Multimodal.imageStatsCompressed(images).collect()
    assert(stats.length == images.count())
    stats.foreach { s =>
      val exp = (0 until (s.width * s.height).toInt).map { px =>
        (s.media_id * 37 + (3 * px) * 11) % 253
      }.sum
      assert(s.r_sum == exp, s"media ${s.media_id}")
    }
  }

  // ---- real audio codec (javax.sound.sampled) ----

  test("WavCodec: WAV encode -> decode round-trips format and exact sample sum") {
    for ((rate, ch, frames) <- Seq((8000, 1, 100), (16000, 2, 137), (44100, 2, 64))) {
      val p = WavCodec.encode(rate, ch, frames, i => (i * 97) % 3001 - 1500)
      // genuine RIFF/WAVE container
      assert(new String(p.take(4), "US-ASCII") == "RIFF")
      assert(new String(p.slice(8, 12), "US-ASCII") == "WAVE")
      val Some((r, c, f, sum)) = WavCodec.decodeStats(p)
      assert((r, c, f) == (rate, ch, frames.toLong))
      assert(sum == (0 until frames * ch).map(i => (i * 97) % 3001 - 1500).sum.toLong)
    }
  }

  test("WavCodec: negative samples, corrupt payloads, truncation") {
    val p = WavCodec.encode(8000, 1, 10, _ => -1)
    assert(WavCodec.decodeStats(p).map(_._4).contains(-10L))
    assert(WavCodec.decodeStats("definitely not audio".getBytes).isEmpty)
    assert(WavCodec.decodeStats(Array.emptyByteArray).isEmpty)
    assert(WavCodec.decodeStats(p.take(10)).isEmpty)
  }

  test("distributed audio pipeline: synthesize WAV -> AudioSystem decode, none dropped") {
    val audio = Multimodal.syntheticWav(spark, sfTiny)
    val stats = Multimodal.audioStats(audio).collect()
    assert(stats.length == audio.count())
    stats.foreach { s =>
      assert(s.sample_rate == 8000 * (1 + s.media_id % 3))
      assert(s.channels == 1 + s.media_id % 2)
      assert(s.n_frames == 120 + s.media_id % 77)
      val n = (s.n_frames * s.channels).toInt
      val exp = (0 until n).map(i => (s.media_id * 131 + i * 17) % 4001 - 2000).sum
      assert(s.amp_sum == exp, s"media ${s.media_id}")
    }
    // corrupt audio rows are dropped, not crashed on
    val corrupt = Seq(AudioRecord(990L, "RIFFxxxx".getBytes)).toDS()
    assert(Multimodal.audioStats(corrupt).count() == 0)
  }

  test("quarantine decode: every record emits exactly one row, correctly classified") {
    val corrupted = Multimodal.syntheticPpmCorrupted(spark, sfTiny)
    val rows = Multimodal.imageStatsQuarantined(corrupted).collect()
    assert(rows.length == corrupted.count(), "no record may vanish")
    rows.foreach { r =>
      if (r.media_id % 7 == 0)
        assert(r.status == "corrupt" && r.r_sum == 0, s"media ${r.media_id}")
      else {
        assert(r.status == "ok", s"media ${r.media_id}")
        val exp = (0 until (r.width * r.height).toInt)
          .map(p => (r.media_id * 31 + (3 * p) * 7) % 251).sum
        assert(r.r_sum == exp, s"media ${r.media_id}")
      }
    }
  }

  // ---- real uncompressed-video codec (YUV4MPEG2) ----

  test("Y4mCodec: encode -> decode round-trips geometry, frames, exact plane sums") {
    val p = Y4mCodec.encode(6, 4, 3, (f, i) => (f * 97 + i * 7) % 256)
    // genuine YUV4MPEG2 stream: ffmpeg would accept this payload
    assert(new String(p.take(9), "US-ASCII") == "YUV4MPEG2")
    val Some(g) = Y4mCodec.decodeHeader(p)
    assert((g.w, g.h, g.chromaPlane) == (6, 4, 24)) // C444: chroma = luma
    val Some(offs) = Y4mCodec.frameOffsets(p, g)
    assert(offs.length == 3)
    val Some((w, h, n, ys, us, vs)) = Y4mCodec.planeSums(p)
    assert((w, h, n) == (6, 4, 3))
    def ref(plane: Int) = (for (f <- 0 until 3; i <- 0 until 24)
      yield (f * 97 + (plane * 24 + i) * 7) % 256).sum.toLong
    assert((ys, us, vs) == (ref(0), ref(1), ref(2)))
  }

  test("Y4mCodec: C420 chroma sizing; unknown chroma and odd-dim C420 rejected") {
    // hand-built C420 stream: luma 4x2=8, chroma planes 2x1=2 each
    val body = Array.tabulate[Byte](12)(i => (i + 1).toByte)
    val p = "YUV4MPEG2 W4 H2 F25:1 C420jpeg\nFRAME\n".getBytes("US-ASCII") ++ body
    val Some(g) = Y4mCodec.decodeHeader(p)
    assert((g.w, g.h, g.chromaPlane, g.frameBytes) == (4, 2, 2, 12))
    val Some((_, _, n, ys, us, vs)) = Y4mCodec.planeSums(p)
    assert(n == 1)
    assert((ys, us, vs) == ((1 to 8).sum.toLong, (9 + 10).toLong, (11 + 12).toLong))
    // default chroma (no C tag) is 420 per the spec
    val dflt = "YUV4MPEG2 W4 H2\nFRAME\n".getBytes("US-ASCII") ++ body
    assert(Y4mCodec.decodeHeader(dflt).map(_.frameBytes).contains(12))
    // 422 is unsupported (not misread as something else); odd dims can't be 420
    assert(Y4mCodec.decodeHeader("YUV4MPEG2 W4 H2 C422\nFRAME\n".getBytes ++ body).isEmpty)
    assert(Y4mCodec.decodeHeader("YUV4MPEG2 W3 H2\n".getBytes).isEmpty)
  }

  test("Y4mCodec: corrupt streams rejected — bad magic, bad marker, truncation, trailing bytes") {
    val good = Y4mCodec.encode(4, 3, 2, (_, i) => i % 256)
    assert(Y4mCodec.planeSums(good).isDefined)
    assert(Y4mCodec.planeSums("MPEG4 not y4m".getBytes).isEmpty)
    assert(Y4mCodec.planeSums(Array.emptyByteArray).isEmpty)
    // truncated mid-frame, truncated mid-marker, trailing garbage
    assert(Y4mCodec.planeSums(good.dropRight(5)).isEmpty)
    assert(Y4mCodec.planeSums(good ++ "FRA".getBytes).isEmpty)
    assert(Y4mCodec.planeSums(good ++ Array[Byte](0)).isEmpty)
    // a FRAME marker with parameters is legal and ignored
    val g = Y4mCodec.decodeHeader(good).get
    val withParams = good.take(g.off) ++ "FRAME Xmeta\n".getBytes ++
      good.slice(g.off + 6, g.off + 6 + g.frameBytes)
    assert(Y4mCodec.planeSums(withParams).map(_._3).contains(1))
    // adversarial dims must not overflow frame arithmetic
    assert(Y4mCodec.decodeHeader(
      ("YUV4MPEG2 W65535 H65535 C444\n" + "FRAME\n").getBytes ++ new Array[Byte](64)).isEmpty)
    assert(Y4mCodec.decodeHeader(
      "YUV4MPEG2 W12884901889 H2 C444\n".getBytes ++ new Array[Byte](64)).isEmpty)
  }

  test("Y4mCodec: frame sampling extracts genuine P6 luma planes, byte-exact") {
    val videos = Multimodal.syntheticY4m(spark, sfTiny)
    val frames = Multimodal.sampleVideoFrames(videos, stride = 2)
    // every sampled frame decodes as a real P6 whose pixels are the luma plane
    val rows = frames.as[(Long, Long, Array[Byte])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, f, ppm) =>
      val Some((w, h, rs, gs, bs)) = PpmCodec.channelSums(ppm)
      assert(rs == gs && gs == bs, "grayscale: all channels carry Y")
      val exp = (0 until w * h).map(i => (id * 29 + f * 101 + i * 13) % 250).sum
      assert(rs == exp, s"video $id frame $f")
    }
    // stride accounting: ceil(frames/2) rows per video
    val perVideo = rows.groupBy(_._1).view.mapValues(_.length).toMap
    Multimodal.videoStats(videos).collect().foreach { s =>
      assert(perVideo(s.media_id) == (s.n_frames + 1) / 2, s"video ${s.media_id}")
    }
  }

  test("distributed video pipeline: synthesize y4m -> decode, none dropped; corrupt dropped") {
    val videos = Multimodal.syntheticY4m(spark, sfTiny)
    val stats = Multimodal.videoStats(videos).collect()
    assert(stats.length == videos.count())
    stats.foreach { s =>
      assert(s.width == 4 + s.media_id % 5 && s.height == 3 + s.media_id % 4)
      assert(s.n_frames == 2 + s.media_id % 4)
      val wh = (s.width * s.height).toInt
      def ref(plane: Int) = (for (f <- 0 until s.n_frames.toInt; i <- 0 until wh)
        yield (s.media_id * 29 + f * 101 + (plane * wh + i) * 13) % 250).sum
      assert((s.y_sum, s.u_sum, s.v_sum) == (ref(0), ref(1), ref(2)), s"video ${s.media_id}")
    }
    val corrupt = Seq(VideoRecord(990L, "YUV4MPEG2 W4 H2\nFRAME\n12".getBytes)).toDS()
    assert(Multimodal.videoStats(corrupt).count() == 0)
  }

  test("pipeline composes: decode -> features -> ANN-ready embedding column") {
    val feats = Multimodal.extractFeatures(media).toDF()
      .withColumnRenamed("media_id", "vec_id")
      .withColumnRenamed("features", "embedding")
    // the similarity operators accept the multimodal features as-is
    val top = graft.operators.Similarity.bruteTopK(
      feats, feats.filter(col("vec_id") < 2), k = 3)
    assert(top.count() == 6)
  }

  // deterministic JPEG frames, identical bytes inside and outside the
  // container — the synthetic-corpus formulas of syntheticAvi
  private def testJpegs(id: Long): (Int, Int, Seq[Array[Byte]]) = {
    val w = (8 + id % 13).toInt; val h = (6 + id % 9).toInt
    val n = (1 + id % 4).toInt
    (w, h, (0 until n).map(f =>
      ImageIoCodec.encode(w, h, "jpg", i => ((id * 31 + f * 101 + i * 7) % 251).toInt)))
  }

  test("AVI/MJPEG: container extraction is byte-exact; stats == single-image JPEG path") {
    for (id <- Seq(0L, 5L, 12L, 38L)) {
      val (w, h, jpegs) = testJpegs(id)
      val avi = AviMjpegCodec.encode(w, h, jpegs)
      val (dw, dh, frames) = AviMjpegCodec.decode(avi)
        .getOrElse(fail(s"clip $id did not decode"))
      assert(dw == w && dh == h && frames.size == jpegs.size)
      // the container returns the EXACT jpeg bytes that went in — the
      // frame path is the oracle-verified ImageIO path on identical input
      frames.zip(jpegs).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b), s"clip $id: frame bytes mutated in transit")
      }
      // differential: sum of the single-image channelSums (the path
      // qm_png_stats hash-verifies against a closed-form oracle) must
      // equal the whole-clip frameStats
      val single = jpegs.map(ImageIoCodec.channelSums(_)
        .getOrElse(fail(s"clip $id: standalone frame undecodable")))
      val (sw, sh, sn, r, g, b) = AviMjpegCodec.frameStats(avi)
        .getOrElse(fail(s"clip $id: frameStats failed"))
      assert((sw, sh, sn) == (w, h, jpegs.size))
      assert(r == single.map(_._3).sum && g == single.map(_._4).sum && b == single.map(_._5).sum,
        s"clip $id: AVI frame stats diverge from the single-image JPEG path")
    }
  }

  test("AVI/MJPEG: malformed containers are quarantined (None), never crash or misread") {
    val (w, h, jpegs) = testJpegs(7L)
    val good = AviMjpegCodec.encode(w, h, jpegs)
    assert(AviMjpegCodec.frameStats(good).isDefined)
    // truncation at every structural boundary
    for (cut <- Seq(4, 11, 40, good.length / 2, good.length - 1))
      assert(AviMjpegCodec.decode(good.take(cut)).isEmpty, s"accepted a $cut-byte prefix")
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(AviMjpegCodec.decode(badMagic).isEmpty)
    // a chunk size pointing past its parent must be rejected, not read
    val overrun = good.clone()
    overrun(4) = 0xFF.toByte; overrun(5) = 0xFF.toByte
    assert(AviMjpegCodec.decode(overrun).isEmpty)
    // corrupt FRAME bytes: container parses, frame decode fails -> whole
    // clip quarantined (find a frame body and zero its JPEG magic)
    val (_, _, frames) = AviMjpegCodec.decode(good).get
    val idx = indexOfSlice(good, frames.head)
    val badFrame = good.clone()
    badFrame(idx) = 0; badFrame(idx + 1) = 0
    assert(AviMjpegCodec.frameStats(badFrame).isEmpty,
      "a clip with an undecodable frame must quarantine whole")
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i + needle.length <= hay.length) {
      if (java.util.Arrays.equals(hay, i, i + needle.length, needle, 0, needle.length)) return i
      i += 1
    }
    fail("frame bytes not found in container")
  }

  test("qm_avi_stats: every clip decodes, round-trips byte-exact, and self-certifies") {
    val rows = Multimodal.qmAviStats(spark, sfTiny).collect()
    val docs = graft.sources.Tables.documents(spark, sfTiny).count()
    assert(rows.length == docs, "every clip must decode (no quarantine on clean payloads)")
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Long]("width") == 8 + id % 13)
      assert(r.getAs[Long]("height") == 6 + id % 9)
      assert(r.getAs[Long]("n_frames") == 1 + id % 4)
      assert(r.getAs[Boolean]("container_roundtrip_exact"),
        s"clip $id: parse/write not bijective")
      assert(r.getAs[Boolean]("frame_decode_ok"), s"clip $id: frame decode failed")
    }
    // the pixel-sum surface (aviStats) still decodes every clip
    assert(Multimodal.aviStats(Multimodal.syntheticAvi(spark, sfTiny)).count() == docs)
  }

  test("audioFeatures: windows tile the clip exactly; sign flips counted; corrupt dropped") {
    import spark.implicits._
    // 5 frames, mono: samples +1 -1 +1 -1 +1 -> window of 4: 3 flips,
    // energy 4; tail window of 1: 0 flips, energy 1
    val wav = Multimodal.WavCodec.encode(8000, 1, 5,
      i => if (i % 2 == 0) 1 else -1)
    val rec = Seq(Multimodal.AudioRecord(7L, wav),
      Multimodal.AudioRecord(8L, Array[Byte](1, 2, 3))) // corrupt
      .toDS()
    val got = Multimodal.audioFeatures(rec, window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set((7L, 0L, 4L, 4L, 3L), (7L, 1L, 1L, 1L, 0L)), got.toString)
    // frame totals reconcile on the real corpus: Σ window n_frames ==
    // the decode's frame count for every clip
    val tiles = Multimodal.audioFeatures(Multimodal.syntheticWav(spark, sfTiny))
      .groupBy("media_id").agg(org.apache.spark.sql.functions.sum("n_frames").as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Multimodal.audioStats(Multimodal.syntheticWav(spark, sfTiny)).collect()
      .foreach(s => assert(tiles(s.media_id) == s.n_frames,
        s"windows don't tile clip ${s.media_id}"))
  }

  test("dHash: brightness-shifted clones collide with their donors; bytes differ") {
    import spark.implicits._
    val imgs = Multimodal.syntheticPpmShifted(spark, sfTiny)
    val hashes = Multimodal.imageDHash(imgs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val payloads = imgs.collect().map(r => r.media_id -> r.payload).toMap
    val clones = hashes.keys.filter(id => id % 17 == 5 && id >= 3).toSeq
    assert(clones.nonEmpty, "no planted clones in the corpus")
    clones.foreach { id =>
      assert(hashes(id) == hashes(id - 3),
        s"clone $id must perceptually collide with donor ${id - 3}")
      assert(!java.util.Arrays.equals(payloads(id), payloads(id - 3)),
        s"clone $id must NOT be byte-identical — that would test exact dedup, not perceptual")
    }
    // every hash is 16 lowercase hex chars
    hashes.values.foreach(h => assert(h.matches("[0-9a-f]{16}"), h))
    // the dedup query keeps donors and drops clones
    val kept = Multimodal.qmDhashDedup(spark, sfTiny)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    clones.foreach { id => assert(!kept(id), s"clone $id survived") }
  }

  test("sceneChangeStats: hand-built frames give the exact SAD; corrupt streams drop") {
    import spark.implicits._
    // 2x1 C444, 3 frames: luma planes (10,10) -> (10,50) -> (200,50);
    // SADs: f1 = |10-10|+|50-10| = 40, f2 = |200-10|+|50-50| = 190
    val fb = Array(
      Array(10, 10), Array(10, 50), Array(200, 50))
    val payload = graft.operators.Multimodal.Y4mCodec.encode(2, 1, 3,
      (f, i) => if (i < 2) fb(f)(i) else 0)
    val corrupt = payload.take(payload.length - 1) // truncated last frame
    val videos = Seq(
      graft.operators.Multimodal.VideoRecord(1L, payload),
      graft.operators.Multimodal.VideoRecord(2L, corrupt)).toDS()
    val got = graft.operators.Multimodal.sceneChangeStats(videos, threshold = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSet == Set((1L, 1L, 40L, false), (1L, 2L, 190L, true)), got.mkString(", "))
  }
}
