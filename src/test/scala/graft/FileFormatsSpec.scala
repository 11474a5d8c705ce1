package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{FileFormats, Tables}

class FileFormatsSpec extends SparkSpec {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private lazy val nation = Tables.nation(spark, sfTiny).cache()
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("n_nationkey").collect()
      .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))).mkString("|")).toSeq

  test("CSV round-trip with explicit schema preserves every row") {
    val dir = tmp("graft-csv")
    FileFormats.writeCsv(nation, dir)
    val back = FileFormats.readCsv(spark, nation.schema, dir)
    assert(canon(back) == canon(nation))
  }

  test("JSON-lines round-trip with explicit schema preserves every row") {
    val dir = tmp("graft-json")
    FileFormats.writeJsonLines(nation, dir)
    val back = FileFormats.readJsonLines(spark, nation.schema, dir)
    assert(canon(back) == canon(nation))
  }

  test("ORC round-trip preserves every row and pushes predicates to the scan") {
    val dir = tmp("graft-orc")
    FileFormats.writeOrc(nation, dir)
    val back = FileFormats.readOrc(spark, nation.schema, dir)
    assert(canon(back) == canon(nation))
    val filtered = back.filter(col("n_nationkey") > 10).select("n_name")
    val scan = filtered.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan orc")).getOrElse("")
    assert(scan.contains("PushedFilters: [IsNotNull(n_nationkey), GreaterThan(n_nationkey,10)]")
      || scan.contains("GreaterThan(n_nationkey,10)"),
      s"ORC scan lost predicate pushdown: $scan")
    assert(filtered.count() == nation.filter(col("n_nationkey") > 10).count())
  }

  test("multi-file text source: one row per line across files") {
    val d1 = tmp("graft-txt1"); val d2 = tmp("graft-txt2")
    import spark.implicits._
    Seq("a", "b").toDF("value").coalesce(1).write.mode("overwrite").text(d1)
    Seq("c").toDF("value").coalesce(1).write.mode("overwrite").text(d2)
    val lines = FileFormats.readTextLines(spark, d1, d2)
    assert(lines.count() == 3)
  }

  test("FAILFAST surfaces malformed CSV instead of null-filling") {
    val dir = tmp("graft-bad")
    Files.writeString(java.nio.file.Paths.get(dir, "bad.csv"),
      "k,v\n1,x\nnot_a_number,y\n")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    // permissive: bad cell -> null, row count preserved
    val permissive = FileFormats.readCsv(spark, schema, dir)
    assert(permissive.count() == 2)
    assert(permissive.filter(col("k").isNull).count() == 1)
    // strict: the malformed row must fail the job
    intercept[Exception] {
      FileFormats.readCsvStrict(spark, schema, dir).collect()
    }
  }

  test("partitioned sink prunes partitions under an equality filter") {
    val dir = tmp("graft-part")
    FileFormats.writePartitioned(Tables.documents(spark, sfTiny), dir, "lang")
    val scan = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"no partition pruning in plan:\n$plan")
    // pruned read returns exactly the en rows
    val want = Tables.documents(spark, sfTiny).filter(col("lang") === "en").count()
    assert(scan.count() == want)
  }

  test("compaction collapses small files without losing rows") {
    val in = tmp("graft-small"); val out = tmp("graft-compacted")
    val li = Tables.lineitem(spark, sfTiny)
    li.repartition(40).write.mode("overwrite").parquet(in)
    val smallFiles = new java.io.File(in).listFiles.count(_.getName.endsWith(".parquet"))
    assert(smallFiles == 40)
    FileFormats.compact(spark, in, out, targetBytes = 64L << 20)
    val bigFiles = new java.io.File(out).listFiles.count(_.getName.endsWith(".parquet"))
    assert(bigFiles < smallFiles, s"$bigFiles files after compaction")
    assert(spark.read.parquet(out).count() == li.count())
  }

  test("mergeSchema unions schema versions; old files read nulls for new columns") {
    val dir = tmp("graft-evolve")
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v1")
      .write.mode("overwrite").parquet(s"$dir/epoch=1")
    Seq((2L, "b", 9L)).toDF("id", "v1", "v2")
      .write.mode("overwrite").parquet(s"$dir/epoch=2")
    val merged = FileFormats.readMergedSchema(spark, s"$dir/epoch=1", s"$dir/epoch=2")
    assert(merged.columns.toSet == Set("id", "v1", "v2"))
    val byId = merged.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(merged.columns.indexOf("v2")))
    assert(byId(2L).getLong(merged.columns.indexOf("v2")) == 9L)
  }

  test("projection + filter reach the parquet scan (pushdown sanity)") {
    val df = Tables.lineitem(spark, sfTiny)
      .filter(col("l_quantity") > 45).select("l_orderkey")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$plan")
  }

  test("compressed text (gzip) reads transparently — the crawl-dump arrival format") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gz").toString
    val lines = (1 to 1000).map(i => s"line number $i with payload")
    // write real .gz files through Spark's own codec path
    lines.toDF("value").repartition(2).write
      .option("compression", "gzip").mode("overwrite").text(dir)
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".txt.gz"))
    assert(files.nonEmpty, "expected gzip-compressed part files")
    // magic bytes prove the payload really is gzip, not renamed plaintext
    val head = java.nio.file.Files.readAllBytes(files.head.toPath).take(2)
    assert((head(0) & 0xFF) == 0x1F && (head(1) & 0xFF) == 0x8B, "not a gzip stream")
    // readTextLines (the reference's text-scan surface) round-trips it
    val back = graft.sources.FileFormats.readTextLines(spark, dir)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(back == lines.sorted, "gzip text round-trip lost or mangled lines")
    // caveat pinned: gzip is NOT splittable — each .gz file is one
    // partition regardless of size (the reason a 100 TB lake prefers
    // many medium .gz files or a splittable container)
    assert(spark.read.text(dir).rdd.getNumPartitions == files.length,
      "gzip inputs must map one file to one partition (non-splittable)")
  }
}
