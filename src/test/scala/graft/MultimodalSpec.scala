package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, FloatType, ArrayType}
import graft.operators.Multimodal
import graft.operators.Multimodal.{ImageRecord, MediaRecord, PpmCodec, StubCodec}

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

  test("pipeline composes: decode -> features -> ANN-ready embedding column") {
    val feats = Multimodal.extractFeatures(media).toDF()
      .withColumnRenamed("media_id", "vec_id")
      .withColumnRenamed("features", "embedding")
    // the similarity operators accept the multimodal features as-is
    val top = graft.operators.Similarity.bruteTopK(
      feats, feats.filter(col("vec_id") < 2), k = 3)
    assert(top.count() == 6)
  }
}
