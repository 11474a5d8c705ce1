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
  * This container ships no COMPRESSED-format codecs (JPEG/WAV/MP4), so
  * [[StubCodec]] is a DETERMINISTIC FAKE for those: a tiny "GRFT" header
  * format stands in. Swap `StubCodec` for a real codec (javacv,
  * twelvemonkeys …) and nothing else changes — the schema, the
  * partitioning, the batch iteration shape, and every test below exercise
  * the real Spark-side plumbing.
  *
  * [[PpmCodec]], by contrast, is a REAL codec: binary NetPBM P6 is an
  * actual interchange format and its parse/decode/resize below is
  * complete, pure-JVM byte work — the uncompressed-image path needs no
  * stub at all (qm_image_stats verifies decoded pixel sums per record
  * against an independent closed-form oracle).
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

  /** REAL image codec: binary NetPBM (P6 / PPM), parsed and emitted as
    * raw bytes with no library dependency. Covers the uncompressed-image
    * leg of the multimodal surface for real — header parse, exact
    * per-channel pixel sums (the feature-extract primitive), and
    * nearest-neighbor resize (a genuine pixel transform). Our encoder
    * never writes `#` comments, so the parser doesn't accept them —
    * payloads from elsewhere should be normalized first. */
  object PpmCodec {
    /** `pixel(i)` supplies byte i of the interleaved RGB body. */
    def encode(w: Int, h: Int, pixel: Int => Int): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val body = new Array[Byte](3 * w * h)
      var i = 0
      while (i < body.length) { body(i) = (pixel(i) & 0xFF).toByte; i += 1 }
      header ++ body
    }

    /** (width, height, body offset), or None when not a well-formed P6
      * with maxval 255 and a complete body. */
    def decodeHeader(p: Array[Byte]): Option[(Int, Int, Int)] = {
      if (p.length < 2 || p(0) != 'P' || p(1) != '6') return None
      var i = 2
      def skipWs(): Unit =
        while (i < p.length &&
          (p(i) == '\n' || p(i) == ' ' || p(i) == '\t' || p(i) == '\r')) i += 1
      def int(): Int = {
        var v = 0; val s = i
        while (i < p.length && p(i) >= '0' && p(i) <= '9') { v = v * 10 + (p(i) - '0'); i += 1 }
        if (i == s) -1 else v
      }
      skipWs(); val w = int(); skipWs(); val h = int(); skipWs(); val mx = int()
      // dimension cap (64k per axis) + long arithmetic: an adversarial
      // header like "P6 99999999 99999999" must not overflow 3*w*h into
      // a "valid" negative body length
      if (w <= 0 || h <= 0 || w > 0xFFFF || h > 0xFFFF || mx != 255 || i >= p.length ||
        !(p(i) == '\n' || p(i) == '\r' || p(i) == ' ' || p(i) == '\t')) None
      else {
        i += 1 // exactly one whitespace byte separates maxval from the body
        if ((p.length - i).toLong < 3L * w * h) None else Some((w, h, i))
      }
    }

    /** Integer-exact per-channel sums over the decoded pixels. */
    def channelSums(p: Array[Byte]): Option[(Int, Int, Long, Long, Long)] =
      decodeHeader(p).map { case (w, h, off) =>
        var r = 0L; var g = 0L; var b = 0L
        var i = off
        val end = off + 3 * w * h
        while (i < end) { r += p(i) & 0xFF; g += p(i + 1) & 0xFF; b += p(i + 2) & 0xFF; i += 3 }
        (w, h, r, g, b)
      }

    /** Nearest-neighbor resize to (nw, nh); returns a new P6 payload. */
    def resize(p: Array[Byte], nw: Int, nh: Int): Option[Array[Byte]] =
      decodeHeader(p).map { case (w, h, off) =>
        encode(nw, nh, { i =>
          val pix = i / 3; val c = i % 3
          val x = ((pix % nw).toLong * w / nw).toInt
          val y = ((pix / nw).toLong * h / nh).toInt
          p(off + 3 * (y * w + x) + c) & 0xFF
        })
      }
  }

  case class ImageRecord(media_id: Long, payload: Array[Byte])
  case class ImageStats(media_id: Long, width: Long, height: Long,
                        r_sum: Long, g_sum: Long, b_sum: Long)

  /** Synthetic PPM images derived deterministically from `documents`:
    * dimensions from doc stats, pixel bytes from the same LCG-ish formula
    * the oracle reproduces closed-form. Real P6 payloads — any PPM tool
    * could open them. */
  def syntheticPpm(spark: SparkSession, d: String): Dataset[ImageRecord] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select(col("doc_id"))
      .as[Long]
      .map { id =>
        val w = (8 + id % 13).toInt; val h = (6 + id % 9).toInt
        ImageRecord(id, PpmCodec.encode(w, h, i => ((id * 31 + i * 7) % 251).toInt))
      }
  }

  /** Batch-iterating decode of real P6 payloads → per-record stats; the
    * feature-extract step of an image ingest pipeline (corrupt payloads
    * are dropped). */
  def imageStats(images: Dataset[ImageRecord]): Dataset[ImageStats] = {
    import images.sparkSession.implicits._
    images.mapPartitions(_.flatMap { r =>
      PpmCodec.channelSums(r.payload).map { case (w, h, rs, gs, bs) =>
        ImageStats(r.media_id, w.toLong, h.toLong, rs, gs, bs)
      }
    })
  }

  /** Resize every image (the thumbnail/normalize step); payloads stay
    * real P6 end to end. */
  def resizeImages(images: Dataset[ImageRecord], nw: Int, nh: Int): Dataset[ImageRecord] = {
    import images.sparkSession.implicits._
    images.mapPartitions(_.flatMap { r =>
      PpmCodec.resize(r.payload, nw, nh).map(p => ImageRecord(r.media_id, p))
    })
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

  /** QM2 — REAL image decode, verified per record: encode documents as
    * genuine P6 payloads, decode them back with [[PpmCodec]], and emit
    * exact per-channel pixel sums. The oracle never sees the bytes — it
    * recomputes every sum closed-form from the generator formula — so a
    * hash match proves the encode → binary column → decode → pixel-sum
    * path is byte-exact end to end. */
  def qmImageStats(spark: SparkSession, d: String): DataFrame =
    imageStats(syntheticPpm(spark, d)).toDF()
      .orderBy("media_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qm_binary_stats" -> qmBinaryStats _,
    "qm_image_stats" -> qmImageStats _)

  val oracles: Map[String, String] = Map(
    "qm_image_stats" ->
      ("WITH dims AS (SELECT doc_id AS media_id, 8 + doc_id % 13 AS width, " +
        "6 + doc_id % 9 AS height FROM documents) " +
        "SELECT media_id, width, height, " +
        "CAST(list_sum(list_transform(range(0, width*height), " +
        "p -> (media_id*31 + (3*p)*7) % 251)) AS BIGINT) AS r_sum, " +
        "CAST(list_sum(list_transform(range(0, width*height), " +
        "p -> (media_id*31 + (3*p+1)*7) % 251)) AS BIGINT) AS g_sum, " +
        "CAST(list_sum(list_transform(range(0, width*height), " +
        "p -> (media_id*31 + (3*p+2)*7) % 251)) AS BIGINT) AS b_sum " +
        "FROM dims ORDER BY media_id"),
    "qm_binary_stats" ->
      ("SELECT CASE WHEN doc_id % 3 = 0 THEN 'video' WHEN doc_id % 3 = 1 THEN 'image' " +
        "ELSE 'audio' END AS media_type, COUNT(*) AS n, " +
        "CAST(SUM(9 + LEAST((64 + n_chars % 128) * (48 + doc_id % 96), 256)) AS BIGINT) AS total_bytes " +
        "FROM documents GROUP BY 1 ORDER BY media_type"))
}
