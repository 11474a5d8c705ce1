package graft

import org.apache.spark.sql.functions._
import graft.sources.{FileFormats, Tables}

class ClusteredWriteSpec extends SparkSpec {

  test("range-clustered write: per-file key ranges are pairwise disjoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft-clustered").toString
    FileFormats.writeRangeClustered(
      Tables.events(spark, sfTiny), dir, files = 8, "user_id")
    // per-file min/max — exactly the parquet footer stats row-group
    // pruning consults; disjointness is what makes a key predicate
    // selective instead of matching every file
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("lo"), max("user_id").as("hi"))
      .collect().map(r => (r.getAs[String]("f"), r.getAs[Long]("lo"), r.getAs[Long]("hi")))
    assert(ranges.length > 1, "expected multiple clustered files")
    val sorted = ranges.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array((fa, _, hiA), (fb, loB, _)) =>
        assert(hiA <= loB, s"overlapping file ranges: $fa hi=$hiA vs $fb lo=$loB")
      case _ =>
    }
    // an unclustered write of the same data has no such property: every
    // file spans ~the full key range (control, guards the test itself)
    val flat = java.nio.file.Files.createTempDirectory("graft-flat").toString
    Tables.events(spark, sfTiny).repartition(8).write.mode("overwrite").parquet(flat)
    val flatRanges = spark.read.parquet(flat)
      .groupBy(input_file_name()).agg(min("user_id").as("lo"), max("user_id").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"))).sortBy(_._1)
    val flatOverlaps = flatRanges.sliding(2).count {
      case Array((_, hiA), (loB, _)) => hiA > loB
      case _ => false
    }
    assert(flatOverlaps > 0, "control failed: random partitioning produced disjoint ranges")
  }

  test("row-group sizing: sorted small-group writes prune inside the file (footer evidence)") {
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile

    def groupRanges(dir: String): Seq[(Long, Long, Long)] = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && f.length > 0)
      files.toSeq.flatMap { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.toString), new Configuration()))
        try r.getFooter.getBlocks.asScala.toSeq.map { b =>
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == "l_orderkey").get
          val st = c.getStatistics
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue,
            b.getRowCount)
        } finally r.close()
      }
    }

    val li = Tables.lineitem(spark, sfSmall).select("l_orderkey", "l_quantity")
    val small = java.nio.file.Files.createTempDirectory("graft-rg-small").toString
    FileFormats.writeRowGrouped(li, small, files = 1, blockBytes = 256 * 1024, "l_orderkey")
    val groups = groupRanges(small)
    assert(groups.size >= 4, s"expected many small row groups, got ${groups.size}")
    // sorted write -> per-group key ranges are pairwise disjoint, the
    // property the reader's footer min/max check prunes on
    val sorted = groups.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, hiA, _), (loB, _, _)) => assert(hiA <= loB, "overlapping row groups")
      case _ =>
    }
    // a point predicate overlaps exactly ONE of N groups: the reader
    // decodes ~1/N of the file instead of all of it. Probe strictly
    // inside a group's range — a key ON the cut (duplicates straddling
    // two groups) legitimately overlaps both.
    val mid = sorted(sorted.size / 2)
    assert(mid._2 > mid._1 + 1, "degenerate group range")
    val probe = (mid._1 + mid._2) / 2 max (mid._1 + 1) min (mid._2 - 1)
    val overlapping = groups.filter(g => g._1 <= probe && probe <= g._2)
    assert(overlapping.size == 1, s"point key $probe overlaps ${overlapping.size} groups")
    val skippedRows = groups.map(_._3).sum - overlapping.map(_._3).sum
    assert(skippedRows > groups.map(_._3).sum / 2, "pruning should skip most rows")
    // control: the default 128 MB block puts everything in one group —
    // the same predicate prunes nothing inside the file
    val big = java.nio.file.Files.createTempDirectory("graft-rg-big").toString
    FileFormats.writeRowGrouped(li, big, files = 1, blockBytes = 128L * 1024 * 1024, "l_orderkey")
    assert(groupRanges(big).size == 1, "control failed: default block split into groups")
  }

  test("z-ordered files prune on BOTH dimensions; lexicographic only on the leading one") {
    val src = Tables.events(spark, sfTiny)
      .withColumn("secs", unix_timestamp(col("ts")))
      .select("event_id", "user_id", "secs", "value")
    val st = src.agg(min("user_id"), max("user_id"), min("secs"), max("secs")).collect().head
    val (minU, maxU, minS, maxS) = (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
    // normalize both axes to a COMMON 10-bit resolution: z-order locality
    // requires comparable bit widths (a 31-bit axis interleaved with a
    // 7-bit one degenerates to single-axis ordering)
    val nb = 1024
    val uExpr = s"((user_id - $minU) * $nb) div ${maxU - minU + 1}"
    val sExpr = s"((secs - $minS) * $nb) div ${maxS - minS + 1}"
    val zdir = java.nio.file.Files.createTempDirectory("graft-z").toString
    val lexdir = java.nio.file.Files.createTempDirectory("graft-lex").toString
    FileFormats.writeZOrdered(src, zdir, files = 16, uExpr, sExpr)
    FileFormats.writeRangeClustered(src, lexdir, files = 16, "user_id", "secs")
    def touched(dir: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(dir).filter(pred)
        .select(input_file_name()).distinct().count()
    val probeUser = (minU + maxU) / 2
    val userPred = col("user_id") === probeUser
    val (tLo, tHi) = (minS + (maxS - minS) * 45 / 100, minS + (maxS - minS) * 55 / 100)
    val timePred = col("secs").between(tLo, tHi)
    val (zU, zT) = (touched(zdir, userPred), touched(zdir, timePred))
    val (lexU, lexT) = (touched(lexdir, userPred), touched(lexdir, timePred))
    // lexicographic: near-perfect on the leading key (RangePartitioner
    // boundaries come from sampling, so one hot user's run can straddle
    // a couple of boundaries — allow that margin), helpless on time alone
    assert(lexU <= 3, s"lex leading-key pruning broken: $lexU files")
    // z-order: BOTH axes prune — strictly better than lex on the second
    // axis, real pruning (not all files) on each
    assert(zT < lexT, s"z-order did not beat lex on the 2nd axis: z=$zT lex=$lexT")
    assert(zU < 16 && zT < 16, s"z-order pruned nothing: user=$zU time=$zT of 16")
    // correctness: same rows back regardless of layout
    assert(spark.read.parquet(zdir).filter(timePred).count() == src.filter(timePred).count())
    assert(spark.read.parquet(zdir).filter(userPred).count() == src.filter(userPred).count())
  }

  test("nested struct columns prune to the accessed leaf at the scan (multimodal metadata shape)") {
    // multimodal tables carry wide typed metadata structs next to big
    // binary payloads; reading one leaf must not drag the whole struct
    // (or the payload) through the scan
    val dir = java.nio.file.Files.createTempDirectory("graft-nested").toString
    Tables.events(spark, sfTiny)
      .select(col("event_id"),
        struct(col("user_id"), col("event_type"), col("value")).as("meta"),
        col("props").cast("binary").as("payload"))
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).select(col("meta.user_id"))
    val scan = q.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scan.contains("meta:struct<user_id:bigint>"),
      s"nested pruning lost (whole struct read): $scan")
    assert(!scan.contains("payload"), s"payload column not pruned: $scan")
    assert(q.distinct().count() > 0)
  }

  test("key predicate on clustered data reads back exactly and pushes to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-clustered2").toString
    val src = Tables.events(spark, sfTiny)
    FileFormats.writeRangeClustered(src, dir, files = 8, "user_id")
    val probe = src.select("user_id").first().getLong(0)
    val filtered = spark.read.parquet(dir).filter(col("user_id") === probe)
    // the predicate must reach the parquet scan for footer-stats pruning
    val scanLine = filtered.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(scanLine.contains("EqualTo(user_id"), s"predicate not pushed: $scanLine")
    assert(filtered.count() == src.filter(col("user_id") === probe).count())
    // and all surviving rows came from ONE clustered file
    val files = filtered.select(input_file_name()).distinct().count()
    assert(files == 1L, s"expected the probe key in exactly 1 clustered file, got $files")
  }

  test("bloom-filtered write: footer headers prove absence where min/max cannot (footer evidence)") {
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import spark.implicits._

    // EVEN keys only, deliberately unsorted: every row group's [min,max]
    // spans ~the whole domain, so the column-index rungs of the pruning
    // ladder cannot reject ANY point probe — exactly the case blooms are
    // for (an odd probe key is inside every range yet in no group)
    val n = 20000L
    val df = (0L until n).map(i => (i * 2, s"payload$i")).toDF("k", "v")
      .repartition(1) // one file; unsorted within it
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    FileFormats.writeBloomFiltered(df, dir, Map("k" -> n))

    val file = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0).head
    val r = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file.toString), new Configuration()))
    try {
      val blocks = r.getFooter.getBlocks.asScala.toSeq
      assert(blocks.nonEmpty)
      blocks.foreach { b =>
        val ck = b.getColumns.asScala.find(_.getPath.toDotString == "k").get
        // 1. the bloom header is physically in the footer metadata
        assert(ck.getBloomFilterOffset >= 0,
          "no bloom filter header written for the enabled column")
        val bloom = r.getBloomFilterDataReader(b).readBloomFilter(ck)
        assert(bloom != null, "bloom filter unreadable from the footer")
        // 2. min/max genuinely can't prune an in-range odd probe (the
        //    control that makes the bloom the ONLY absence proof here)
        val st = ck.getStatistics
        val (lo, hi) = (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
          st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
        val oddProbes = (1L to 99L by 2L).map(lo + _).filter(p => p > lo && p < hi)
        assert(oddProbes.nonEmpty && oddProbes.forall(p => p % 2 == 1))
        // 3. no false negatives: every written key answers "might contain"
        val presentMisses = (0L until 200L).map(_ * 2)
          .count(k => !bloom.findHash(bloom.hash(java.lang.Long.valueOf(k))))
        assert(presentMisses == 0, s"$presentMisses written keys denied — FN is a contract breach")
        // 4. absence proof: odd keys (inside [min,max]!) are rejected, so
        //    a point reader skips this group where stats alone kept it
        val rejected = oddProbes
          .count(p => !bloom.findHash(bloom.hash(java.lang.Long.valueOf(p))))
        assert(rejected >= oddProbes.size - 2, // sized at true ndv: FP ~1%
          s"bloom rejected only $rejected/${oddProbes.size} absent keys")
        // 5. and the non-enabled column carries no header (per-column opt-in)
        val cv = b.getColumns.asScala.find(_.getPath.toDotString == "v").get
        assert(cv.getBloomFilterOffset < 0, "bloom written for a non-enabled column")
      }
    } finally r.close()
    // round-trip sanity: the data itself is untouched by the option
    assert(spark.read.parquet(dir).count() == n)
    assert(spark.read.parquet(dir).filter(col("k") === 101L).count() == 0)
    assert(spark.read.parquet(dir).filter(col("k") === 100L).count() == 1)

    // and the READER honors it: parquet-mr's own row-group filter keeps
    // every group at the statistics level (odd probe inside [min,max])
    // but drops them all once the bloom level joins in — the exact
    // "skips row groups the column index alone can't" contract
    import org.apache.parquet.filter2.compat.{FilterCompat, RowGroupFilter}
    import org.apache.parquet.filter2.predicate.FilterApi
    val r2 = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file.toString), new Configuration()))
    try {
      val blocks = r2.getFooter.getBlocks
      def surviving(value: Long, levels: RowGroupFilter.FilterLevel*): Int =
        RowGroupFilter.filterRowGroups(
          java.util.Arrays.asList(levels: _*),
          FilterCompat.get(FilterApi.eq(FilterApi.longColumn("k"),
            java.lang.Long.valueOf(value))),
          blocks, r2).size
      import RowGroupFilter.FilterLevel._
      val absentOdd = 101L // inside every group's [min,max], never written
      assert(surviving(absentOdd, STATISTICS) == blocks.size,
        "control failed: stats alone should keep every group for an in-range key")
      assert(surviving(absentOdd, STATISTICS, BLOOMFILTER) == 0,
        "reader kept groups the bloom filter can prove empty")
      assert(surviving(100L, STATISTICS, BLOOMFILTER) == blocks.size,
        "a present key must never be bloom-skipped (false negative)")
    } finally r2.close()
  }
}
