package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, FloatType, ArrayType}
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaRecord, StubCodec}

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
