package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

import graft.sources.Tables
import Mp4.{BitReader, BitWriter, Mp4Malformed, Pps, Sps,
  emulationPrevent, emulationStrip}

/** REAL H.264 PIXEL decode for the I_PCM subset (ITU-T H.264 §7.3.5,
  * mb_type 25) — pure JVM, closing the [[Mp4]] demuxer's pixel gap for
  * the one slice coding a stock JVM can be EXACT about.
  *
  * I_PCM macroblocks carry their 16×16 luma + 2×8×8 chroma samples RAW
  * in the bitstream (byte-aligned, §8.3.5: decoding is a copy) — the
  * escape hatch the standard mandates every profile support so that no
  * macroblock may compress to MORE than its raw size. An all-PCM IDR
  * stream is therefore fully conformant (any H.264 decoder plays it)
  * AND losslessly decodable without entropy machinery. This module:
  *
  *  - encodes conformant IDR slices of all-PCM macroblocks (full slice
  *    header for the Baseline SPS/PPS [[Mp4.writeSps]]/[[Mp4.writePps]]
  *    emit, emulation-prevented);
  *  - decodes them through a COMPLETE §7.3.3 slice-header parse driven
  *    by the REAL parsed SPS/PPS (frame_num width, POC type 0/1/2
  *    fields, IDR marking, deblocking controls, CABAC alignment
  *    rejected) — not a byte-offset skip;
  *  - QUARANTINES everything the subset excludes, loudly as None:
  *    CABAC slices, any entropy-coded macroblock (mb_type ≠ I_PCM),
  *    non-I slices, chroma formats ≠ 4:2:0, field coding, multi-slice
  *    offsets. Entropy-coded residual decode lives in [[H264Cavlc]]
  *    (the dense-residual CAVLC subset); what remains excluded —
  *    sparse-residual VLC tables, CABAC — is adjudicated there: a
  *    wrong decoder is worse than an honest None.
  *
  * Composed with [[Mp4]], this is MP4 → avcC SPS/PPS → IDR slice →
  * PIXELS end to end, scan-side in `mapPartitions`, zero shuffle. */
object H264Pcm {

  /** One decoded 4:2:0 frame: cropped planes, row-major. */
  case class Frame(width: Int, height: Int, y: Array[Byte],
                   cb: Array[Byte], cr: Array[Byte])

  // ─────────────────────────────────────────────────────────────────
  // Encoder: an IDR slice of all-PCM macroblocks
  // ─────────────────────────────────────────────────────────────────

  /** Encode `w`×`h` (even, cropped from the 16-aligned MB grid) planes
    * as one conformant IDR slice NAL for [[Mp4.writeSps]]'s SPS and
    * [[Mp4.writePps]]'s PPS. Pixel functions index row-major over the
    * CODED (MB-aligned) grid; padding samples beyond the crop replicate
    * the formula — decode returns only the cropped window. */
  def encodeIdrPcm(w: Int, h: Int, yAt: Int => Int, cbAt: Int => Int,
                   crAt: Int => Int, frameNum: Int = 0,
                   idrPicId: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0,
      s"h264: even dimensions required (got ${w}x$h)")
    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16
    val bw = new BitWriter
    // slice_header (§7.3.3) under writeSps/writePps's parameters
    bw.ue(0) // first_mb_in_slice
    bw.ue(7) // slice_type: I (all slices of the picture)
    bw.ue(0) // pic_parameter_set_id
    bw.u(frameNum & 0xF, 4) // frame_num: log2_max_frame_num_minus4=0 → 4 bits
    bw.ue(idrPicId) // idr_pic_id (IDR NAL)
    // pic_order_cnt_type=2 → no POC syntax; I slice → no ref syntax
    // dec_ref_pic_marking for IDR:
    bw.u(0, 1) // no_output_of_prior_pics_flag
    bw.u(0, 1) // long_term_reference_flag
    bw.se(0) // slice_qp_delta
    // deblocking_filter_control_present_flag=0 → no filter syntax
    // slice_data: raster MBs, each I_PCM
    val cw = mbW * 16
    var mb = 0
    while (mb < mbW * mbH) {
      val mx = (mb % mbW) * 16
      val my = (mb / mbW) * 16
      bw.ue(25) // mb_type: I_PCM
      bw.alignZero() // pcm_alignment_zero_bit*
      var i = 0
      while (i < 256) { // pcm_sample_luma, raster within the MB
        bw.u(yAt((my + i / 16) * cw + mx + i % 16) & 0xFF, 8); i += 1
      }
      val ccw = cw / 2
      i = 0
      while (i < 64) {
        bw.u(cbAt((my / 2 + i / 8) * ccw + mx / 2 + i % 8) & 0xFF, 8); i += 1
      }
      i = 0
      while (i < 64) {
        bw.u(crAt((my / 2 + i / 8) * ccw + mx / 2 + i % 8) & 0xFF, 8); i += 1
      }
      mb += 1
    }
    bw.stopAndAlign() // rbsp_slice_trailing_bits
    Array(0x65.toByte) ++ emulationPrevent(bw.toBytes) // IDR, ref_idc 3
  }

  // ─────────────────────────────────────────────────────────────────
  // Decoder: slice header (§7.3.3) + all-PCM slice data
  // ─────────────────────────────────────────────────────────────────

  /** Decode one IDR/non-IDR slice NAL under its REAL SPS/PPS; None
    * quarantines anything outside the PCM subset. */
  def decode(sps: Sps, pps: Pps, nal: Array[Byte]): Option[Frame] =
    try Some(decodeStrict(sps, pps, nal)) catch {
      case _: Mp4Malformed | _: ArrayIndexOutOfBoundsException => None
    }

  def decodeStrict(sps: Sps, pps: Pps, nal: Array[Byte]): Frame = {
    if (nal.length < 2) throw new Mp4Malformed("slice NAL too short")
    val nalType = nal(0) & 0x1F
    val nalRefIdc = (nal(0) >> 5) & 0x3
    if (nalType != 5 && nalType != 1)
      throw new Mp4Malformed(s"not a coded slice NAL (type $nalType)")
    val idr = nalType == 5
    if (pps.entropyCoding != 0)
      throw new Mp4Malformed("CABAC slice (entropy decode is out of subset)")
    if (sps.chromaFormatIdc != 1)
      throw new Mp4Malformed(s"chroma_format_idc ${sps.chromaFormatIdc} (4:2:0 only)")
    if (sps.frameMbsOnly != 1)
      throw new Mp4Malformed("field/MBAFF coding is out of subset")
    val r = new BitReader(emulationStrip(nal.drop(1)))
    // slice_header
    if (r.ue() != 0)
      throw new Mp4Malformed("multi-slice pictures are out of subset")
    val sliceType = r.ue()
    if (sliceType % 5 != 2) // I slice (2 or 7)
      throw new Mp4Malformed(s"slice_type $sliceType (I only)")
    r.ue() // pic_parameter_set_id
    r.u(sps.log2MaxFrameNumMinus4 + 4) // frame_num
    if (idr) r.ue() // idr_pic_id
    sps.picOrderCntType match {
      case 0 =>
        r.u(sps.log2MaxPocLsbMinus4 + 4) // pic_order_cnt_lsb
        if (pps.bottomFieldPicOrder == 1) r.se() // delta_pic_order_cnt_bottom
      case 1 => // its slice fields depend on delta_pic_order_always_zero,
        // which Sps does not retain — misparsing could decode WRONG
        // pixels instead of failing, so type 1 quarantines outright
        throw new Mp4Malformed("pic_order_cnt_type 1 is out of subset")
      case _ => ()
    }
    if (pps.redundantPicCnt == 1) r.ue() // redundant_pic_cnt
    // I slice → no direct/ref/reordering/weighted syntax
    if (nalRefIdc != 0) {
      if (idr) { r.u(1); r.u(1) } // no_output_of_prior / long_term_reference
      else if (r.u(1) == 1) // adaptive_ref_pic_marking_mode_flag
        throw new Mp4Malformed("adaptive ref marking is out of subset")
    }
    r.se() // slice_qp_delta
    if (pps.deblockingControl == 1) {
      val idc = r.ue() // disable_deblocking_filter_idc
      if (idc != 1) { r.se(); r.se() } // alpha/beta offsets
    }
    // slice_data: every MB must be I_PCM
    val mbW = sps.mbWidth
    val mbH = sps.mbHeight
    val cw = mbW * 16
    val ch = mbH * 16
    val y = new Array[Byte](cw * ch)
    val cb = new Array[Byte]((cw / 2) * (ch / 2))
    val cr = new Array[Byte]((cw / 2) * (ch / 2))
    var mb = 0
    while (mb < mbW * mbH) {
      val t = r.ue()
      if (t != 25) throw new Mp4Malformed(
        s"mb_type $t at MB $mb (entropy-coded residual is out of subset)")
      r.align()
      val mx = (mb % mbW) * 16
      val my = (mb / mbW) * 16
      var i = 0
      while (i < 256) {
        y((my + i / 16) * cw + mx + i % 16) = r.u(8).toByte; i += 1
      }
      val ccw = cw / 2
      i = 0
      while (i < 64) {
        cb((my / 2 + i / 8) * ccw + mx / 2 + i % 8) = r.u(8).toByte; i += 1
      }
      i = 0
      while (i < 64) {
        cr((my / 2 + i / 8) * ccw + mx / 2 + i % 8) = r.u(8).toByte; i += 1
      }
      mb += 1
    }
    // crop to the SPS display window (top-left anchored, writeSps's form)
    val (w, h) = (sps.width, sps.height)
    if (w > cw || h > ch) throw new Mp4Malformed("SPS crop exceeds coded grid")
    def cropPlane(src: Array[Byte], sw: Int, dw: Int, dh: Int): Array[Byte] = {
      val out = new Array[Byte](dw * dh)
      var row = 0
      while (row < dh) {
        System.arraycopy(src, row * sw, out, row * dw, dw); row += 1
      }
      out
    }
    Frame(w, h,
      cropPlane(y, cw, w, h),
      cropPlane(cb, cw / 2, w / 2, h / 2),
      cropPlane(cr, cw / 2, w / 2, h / 2))
  }

  // ─────────────────────────────────────────────────────────────────
  // Spark surface: synthetic MP4+PCM corpus, end-to-end pixel stats
  // ─────────────────────────────────────────────────────────────────

  import Multimodal.VideoRecord

  /** Deterministic MP4 clips whose video samples are REAL all-PCM IDR
    * slices — every byte decodable, every container table real. */
  def syntheticMp4Pcm(spark: SparkSession, d: String): Dataset[VideoRecord] = {
    import spark.implicits._
    Tables.fanOut(Tables.documents(spark, d)
      .select(col("doc_id"))
      .as[Long])
      .map { id =>
        val w = (16 + 2 * (id % 9)).toInt
        val h = (16 + 2 * (id % 5)).toInt
        val n = (1 + id % 3).toInt
        val sps = Mp4.writeSps(w, h)
        val pps = Mp4.writePps()
        val samples = (0 until n).map { f =>
          Mp4.avccSample(Seq(encodeIdrPcm(w, h,
            i => ((id * 31 + f * 17 + i * 7) % 251).toInt,
            i => ((id * 13 + f * 19 + i * 5) % 241).toInt,
            i => ((id * 11 + f * 23 + i * 3) % 239).toInt,
            frameNum = 0, idrPicId = f)))
        }
        VideoRecord(id, Mp4.writeMp4(w, h, samples, 1 to n, sps, pps))
      }
  }

  /** MP4 → avcC → IDR PCM slices → PIXEL sums per clip: the sums run
    * over the CROPPED display window, so a hash match proves the whole
    * chain — container walk, SPS/PPS parse, slice header, PCM samples,
    * crop — byte-exact. Undecodable clips quarantine (dropped). */
  def h264PcmStats(videos: Dataset[VideoRecord]): DataFrame = {
    import videos.sparkSession.implicits._
    videos.mapPartitions(_.flatMap { r =>
      Mp4.demux(r.payload).flatMap { t =>
        t.sps.flatMap { sps =>
          try {
            val pps = Mp4.parsePps(t.ppsNal)
            val frames = t.samples.flatMap { s =>
              Mp4.nalUnits(r.payload, s, t.lengthSize)
                .filter(n => n._1 == 5 || n._1 == 1)
                .map(n => decodeStrict(sps, pps,
                  Array((0x60 | n._1).toByte) ++ n._2))
            }
            if (frames.isEmpty) None
            else {
              def sum(p: Frame => Array[Byte]) =
                frames.iterator.flatMap(f => p(f).iterator)
                  .map(b => (b & 0xFF).toLong).sum
              Some((r.media_id, sps.width, sps.height, frames.size.toLong,
                sum(_.y), sum(_.cb), sum(_.cr)))
            }
          } catch { case _: Mp4Malformed => None }
        }
      }
    }).toDF("media_id", "width", "height", "n_frames",
      "y_sum", "cb_sum", "cr_sum")
  }

  /** QM — the end-to-end MP4 → H.264 I_PCM pixel gate. */
  def qmH264Pcm(spark: SparkSession, d: String): DataFrame =
    h264PcmStats(syntheticMp4Pcm(spark, d)).orderBy("media_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qm_h264_pcm" -> qmH264Pcm _)

  val oracles: Map[String, String] = Map(
    // every plane sum recomputed closed-form from doc_id over the
    // CROPPED window (the coded grid pads to 16; the oracle sums only
    // the display pixels the decoder returns)
    "qm_h264_pcm" ->
      ("WITH p AS (SELECT doc_id AS media_id, " +
        "16 + 2*(doc_id % 9) AS w, 16 + 2*(doc_id % 5) AS h, " +
        "1 + doc_id % 3 AS n, " +
        "16*((16 + 2*(doc_id % 9) + 15)//16) AS cw FROM documents) " +
        "SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, " +
        "CAST(n AS BIGINT) AS n_frames, " +
        "CAST(list_sum(list_transform(range(0, CAST(n AS BIGINT)), f -> " +
        "list_sum(list_transform(range(0, CAST(h AS BIGINT)), row -> " +
        "list_sum(list_transform(range(0, CAST(w AS BIGINT)), cl -> " +
        "(media_id*31 + f*17 + (row*cw + cl)*7) % 251)))))) AS BIGINT) AS y_sum, " +
        "CAST(list_sum(list_transform(range(0, CAST(n AS BIGINT)), f -> " +
        "list_sum(list_transform(range(0, CAST(h AS BIGINT)//2), row -> " +
        "list_sum(list_transform(range(0, CAST(w AS BIGINT)//2), cl -> " +
        "(media_id*13 + f*19 + (row*(cw//2) + cl)*5) % 241)))))) AS BIGINT) AS cb_sum, " +
        "CAST(list_sum(list_transform(range(0, CAST(n AS BIGINT)), f -> " +
        "list_sum(list_transform(range(0, CAST(h AS BIGINT)//2), row -> " +
        "list_sum(list_transform(range(0, CAST(w AS BIGINT)//2), cl -> " +
        "(media_id*11 + f*23 + (row*(cw//2) + cl)*3) % 239)))))) AS BIGINT) AS cr_sum " +
        "FROM p ORDER BY media_id"))
}
