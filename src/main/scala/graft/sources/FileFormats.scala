package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Text-family sources and sinks beyond parquet (SURVEY.md §2.2 "Sources"
  * row: text lines, CSV, JSON; multi-file; partitioned writes).
  *
  * Rules that matter at 100 TB:
  *  - ALWAYS pass an explicit schema. `inferSchema`/schema-on-read means
  *    an extra full pass over the data before the query starts.
  *  - Corrupt records: default is PERMISSIVE (bad row → nulls +
  *    `_corrupt_record` if declared in the schema). Use FAILFAST in
  *    pipelines where silent null-filling would poison training data.
  *  - Partitioned writes (`partitionBy`) turn equality filters on the
  *    partition column into directory pruning — the scan never opens
  *    non-matching files.
  */
object FileFormats {

  def readCsv(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(paths: _*)

  def readCsvStrict(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("mode", "FAILFAST").csv(paths: _*)

  def readJsonLines(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read.schema(schema).json(paths: _*)

  /** Newline-delimited text, one row per line (the reference's only
    * source, O1) — multi-file, splittable. */
  def readTextLines(spark: SparkSession, paths: String*): DataFrame =
    spark.read.text(paths: _*)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Hive-style partitioned parquet sink: one directory per value of
    * `partitionCol`; equality/IN filters on it prune at planning time. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Compact a directory of small parquet files into ~`targetBytes`
    * files. Streaming sinks and over-parallel writers leave thousands of
    * tiny files; at 100 TB the resulting open/footer overhead dominates
    * scan time, so periodic compaction is part of the pipeline, not an
    * afterthought. Sizing uses the on-disk byte count (compressed), so
    * output files land near the target. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L << 20): Unit = {
    val df = spark.read.parquet(inPath)
    val totalBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val files = math.max(1, (BigDecimal(totalBytes) / targetBytes).setScale(0,
      BigDecimal.RoundingMode.CEILING).toInt)
    df.repartition(files).write.mode("overwrite").parquet(outPath)
  }

  /** Read parquet written across schema versions: `mergeSchema` unions
    * per-file schemas (columns absent in older files read as null). Off
    * by default in Spark because it footer-scans every file — turn it on
    * only at evolution boundaries, then rewrite to the target schema. */
  def readMergedSchema(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}
