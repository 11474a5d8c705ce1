package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal columns: images/audio/video ride through the engine as
  * opaque `binary` payloads with typed metadata; per-record decode /
  * feature-extraction / frame-sampling runs as imperative per-partition
  * batch logic (`Dataset.mapPartitions` — the JVM analogue of a
  * batch-iterating Python `mapInPandas` UDF: one iterator per partition,
  * records streamed, no per-row task overhead).
  *
  * ── STUB BOUNDARY ────────────────────────────────────────────────────
  * This container ships no image/audio codecs, so [[StubCodec]] is a
  * DETERMINISTIC FAKE: a tiny "GRFT" header format stands in for
  * JPEG/WAV/MP4. Swap `StubCodec` for a real codec (javacv, twelvemonkeys
  * …) and nothing else changes — the schema, the partitioning, the batch
  * iteration shape, and every test below exercise the real Spark-side
  * plumbing.
  * ─────────────────────────────────────────────────────────────────────
  */
object Multimodal {

  case class MediaRecord(media_id: Long, media_type: String, payload: Array[Byte])
  case class DecodedMedia(media_id: Long, media_type: String,
                          width: Int, height: Int, n_frames: Int)
  case class MediaFeatures(media_id: Long, features: Array[Float])

  /** Fake codec for the synthetic "GRFT" container format:
    * bytes 0-3 magic "GRFT", 4-5 width (BE int16), 6-7 height, 8 frame
    * count, 9+ payload. Deterministic stand-in for a real decoder. */
  object StubCodec {
    val Magic: Array[Byte] = "GRFT".getBytes("US-ASCII")
    val HeaderLen = 9

    def encode(id: Long, mediaType: String, w: Int, h: Int, frames: Int): Array[Byte] = {
      val body = new Array[Byte](w * h min 256)
      var i = 0
      while (i < body.length) { body(i) = ((id * 31 + i * 7) % 251).toByte; i += 1 }
      Magic ++ Array[Byte](
        ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte,
        ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
        (frames & 0xFF).toByte) ++ body
    }

    def decode(payload: Array[Byte]): Option[(Int, Int, Int)] =
      if (payload.length < HeaderLen || !payload.take(4).sameElements(Magic)) None
      else Some((
        ((payload(4) & 0xFF) << 8) | (payload(5) & 0xFF),
        ((payload(6) & 0xFF) << 8) | (payload(7) & 0xFF),
        payload(8) & 0xFF))

    /** Fake feature vector: 16-bin byte histogram of the body, L1
      * normalized — stands in for a real embedding model. */
    def features(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](16)
      var i = HeaderLen
      while (i < payload.length) { hist((payload(i) & 0xFF) >> 4) += 1f; i += 1 }
      val total = math.max(1f, payload.length - HeaderLen)
      hist.map(_ / total)
    }
  }

  /** Decode metadata from the payload header — batch-iterating per
    * partition; corrupt records are dropped (count them upstream with a
    * filter on [[StubCodec.decode]] if needed). */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      StubCodec.decode(r.payload).map { case (w, h, f) =>
        DecodedMedia(r.media_id, r.media_type, w, h, f)
      }
    })
  }

  /** Per-record feature extraction (the embed step of an ingest
    * pipeline). Output pairs with [[Similarity.annTopK]] for dedup. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => MediaFeatures(r.media_id, StubCodec.features(r.payload))))
  }

  /** Frame sampling for video-typed records: every `stride`-th body byte
    * run becomes a "frame" (stub — a real impl slices keyframes). Output
    * is one row per sampled frame, exploded — the shape that lets frames
    * shuffle/partition independently of their source video. */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      StubCodec.decode(r.payload).toSeq.flatMap { case (_, _, frames) =>
        (0 until frames by stride).map { f =>
          val body = r.payload.drop(StubCodec.HeaderLen)
          val chunk = if (body.isEmpty) Array.emptyByteArray
                      else body.slice(f % body.length, math.min((f % body.length) + 16, body.length))
          (r.media_id, f, chunk)
        }
      }
    }).toDF("media_id", "frame_idx", "frame")
  }

  /** Synthetic media table derived deterministically from `documents`
    * (no media files ship with the testdata): doc text bytes become the
    * payload body, doc stats become dimensions. */
  def syntheticMedia(spark: SparkSession, d: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, lang, n) =>
        val mediaType = if (id % 3 == 0) "video" else if (id % 3 == 1) "image" else "audio"
        val w = (64 + (n % 128)).toInt; val h = (48 + (id % 96)).toInt
        val frames = if (mediaType == "video") (8 + id % 24).toInt else 1
        MediaRecord(id, mediaType, StubCodec.encode(id, mediaType, w, h, frames))
      }
  }

  /** QM1 — binary-column aggregate over the synthetic media: payload
    * byte sizes per media type. The oracle reproduces the payload length
    * arithmetic (header + min(w*h, 256)) from the same doc columns —
    * checking that the binary plumbing preserves every byte. */
  def qmBinaryStats(spark: SparkSession, d: String): DataFrame =
    syntheticMedia(spark, d).toDF()
      .select(col("media_type"), length(col("payload")).cast("long").as("bytes"))
      .groupBy("media_type")
      .agg(count(lit(1)).as("n"), sum("bytes").as("total_bytes"))
      .orderBy("media_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qm_binary_stats" -> qmBinaryStats _)

  val oracles: Map[String, String] = Map(
    "qm_binary_stats" ->
      ("SELECT CASE WHEN doc_id % 3 = 0 THEN 'video' WHEN doc_id % 3 = 1 THEN 'image' " +
        "ELSE 'audio' END AS media_type, COUNT(*) AS n, " +
        "CAST(SUM(9 + LEAST((64 + n_chars % 128) * (48 + doc_id % 96), 256)) AS BIGINT) AS total_bytes " +
        "FROM documents GROUP BY 1 ORDER BY media_type"))
}
