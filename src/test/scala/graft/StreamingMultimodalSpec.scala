package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{AudioRecord, ImageRecord, VideoRecord}

/** Streaming multimodal ingest: the operators that decode binary media
  * columns ([[Multimodal.imageStatsCompressed]], [[Multimodal.audioStats]])
  * are plain `Dataset` transforms, so the SAME code runs over a
  * Structured-Streaming file source — the ingest shape a real pipeline
  * uses (payload files land in a directory, each micro-batch decodes the
  * new arrivals). These specs pin batch/stream equivalence: every record
  * decoded exactly once, stats identical to the batch run, no
  * decode-driven shuffle added to the streaming plan. */
class StreamingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toFile.getAbsolutePath

  test("PNG file-source stream decodes arrivals incrementally == batch ImageIO decode") {
    val dir = tempDir("stream_png")
    val records = Multimodal.syntheticPng(spark, sfTiny)
    val all = records.collect()
    val (first, second) = all.splitAt(all.length / 2)

    // first batch of payload files is already on disk when the query starts
    first.toSeq.toDS().write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema("media_id LONG, payload BINARY")
      .parquet(dir)
      .as[ImageRecord]
    val q = Multimodal.imageStatsCompressed(stream)
      .writeStream.format("memory").queryName("png_stream").outputMode("append")
      .start()
    val got = try {
      q.processAllAvailable()
      val afterFirst = spark.table("png_stream").count()
      assert(afterFirst == first.length, s"first arrival: $afterFirst")
      // second arrival lands while the query is running
      second.toSeq.toDS().write.mode("append").parquet(dir)
      q.processAllAvailable()
      spark.table("png_stream").collect()
    } finally q.stop()

    val want = Multimodal.imageStatsCompressed(records).collect()
    assert(got.length == want.length, s"stream ${got.length} vs batch ${want.length}")
    val gotByIdRaw = got.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    want.foreach { s =>
      assert(gotByIdRaw(s.media_id) ==
        ((s.width, s.height, s.r_sum, s.g_sum, s.b_sum)), s"media ${s.media_id}")
    }
  }

  test("WAV file-source stream decodes == batch AudioSystem decode; corrupt rows dropped") {
    val dir = tempDir("stream_wav")
    val records = Multimodal.syntheticWav(spark, sfTiny)
    // plant a corrupt payload among the real ones: dropped, not crashed on
    val withCorrupt = records.union(
      Seq(AudioRecord(999999L, "RIFFjunk".getBytes)).toDS())
    withCorrupt.write.mode("append").parquet(dir)

    val stream = spark.readStream
      .schema("media_id LONG, payload BINARY")
      .parquet(dir)
      .as[AudioRecord]
    val q = Multimodal.audioStats(stream)
      .writeStream.format("memory").queryName("wav_stream").outputMode("append")
      .start()
    val got = try {
      q.processAllAvailable()
      spark.table("wav_stream").collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    } finally q.stop()

    val want = Multimodal.audioStats(records).collect()
    assert(got.size == want.length, "corrupt record must be dropped, real ones kept")
    want.foreach { s =>
      assert(got(s.media_id) ==
        ((s.sample_rate, s.channels, s.n_frames, s.amp_sum)), s"media ${s.media_id}")
    }
  }

  test("Y4M file-source stream decodes video arrivals == batch Y4mCodec decode") {
    val dir = tempDir("stream_y4m")
    val records = Multimodal.syntheticY4m(spark, sfTiny)
    val all = records.collect()
    val (first, second) = all.splitAt(all.length / 2)

    first.toSeq.toDS().write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema("media_id LONG, payload BINARY")
      .parquet(dir)
      .as[VideoRecord]
    val q = Multimodal.videoStats(stream)
      .writeStream.format("memory").queryName("y4m_stream").outputMode("append")
      .start()
    val got = try {
      q.processAllAvailable()
      assert(spark.table("y4m_stream").count() == first.length)
      second.toSeq.toDS().write.mode("append").parquet(dir)
      q.processAllAvailable()
      spark.table("y4m_stream").collect()
    } finally q.stop()

    val want = Multimodal.videoStats(records).collect()
    assert(got.length == want.length, s"stream ${got.length} vs batch ${want.length}")
    val byId = got.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    want.foreach { s =>
      assert(byId(s.media_id) ==
        ((s.width, s.height, s.n_frames, s.y_sum, s.u_sum, s.v_sum)), s"media ${s.media_id}")
    }
  }

  test("MP4 file-source stream demuxes+PCM-decodes arrivals == batch chain") {
    import graft.operators.H264Pcm
    val dir = tempDir("stream_mp4")
    val records = H264Pcm.syntheticMp4Pcm(spark, sfTiny)
    val all = records.collect()
    val (first, second) = all.splitAt(all.length / 2)
    first.toSeq.toDS().write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema("media_id LONG, payload BINARY")
      .parquet(dir)
      .as[VideoRecord]
    val q = H264Pcm.h264PcmStats(stream)
      .writeStream.format("memory").queryName("mp4_stream").outputMode("append")
      .start()
    val got = try {
      q.processAllAvailable()
      assert(spark.table("mp4_stream").count() == first.length)
      second.toSeq.toDS().write.mode("append").parquet(dir)
      q.processAllAvailable()
      spark.table("mp4_stream").collect()
    } finally q.stop()
    val want = H264Pcm.h264PcmStats(records).collect()
    assert(got.length == want.length, s"stream ${got.length} vs batch ${want.length}")
    val byId = got.map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    want.foreach { r =>
      assert(byId(r.getLong(0)) ==
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))),
        s"media ${r.getLong(0)}")
    }
  }

  test("streaming decode plan is stateless and shuffle-free (scan -> decode -> sink)") {
    val dir = tempDir("stream_plan")
    Multimodal.syntheticPng(spark, sfTiny).write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema("media_id LONG, payload BINARY")
      .parquet(dir)
      .as[ImageRecord]
    val q = Multimodal.imageStatsCompressed(stream)
      .writeStream.format("memory").queryName("plan_stream").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(buf) { q.explain(extended = true) }
      val plan = buf.toString("UTF-8")
      assert(plan.contains("Scan"), s"expected a plan dump, got:\n$plan")
      // per-record decode must not introduce an exchange or state store:
      // a shuffle here would re-partition every payload byte per batch
      assert(!plan.contains("Exchange"), s"decode added a shuffle:\n$plan")
      assert(!plan.contains("StateStore"), s"decode added state:\n$plan")
    } finally q.stop()
  }
}
