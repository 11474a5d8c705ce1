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
}
