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

  /** ORC source/sink — the second columnar format in lake migrations
    * (Hive-era warehouses are ORC). Spark's native vectorized ORC reader
    * gives the same pushdown/pruning machinery as parquet: predicates
    * reach stripe/row-group stats, column pruning applies, and
    * `spark.sql.orc.filterPushdown` is on by default in Spark 4. */
  def readOrc(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read.schema(schema).orc(paths: _*)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

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

  /** Range-clustered parquet write: `repartitionByRange` + in-partition
    * sort gives each output file a DISJOINT range of `keys`, so every
    * file/row-group's parquet min-max statistics become selective and a
    * range or point predicate on the key decodes only the O(1) matching
    * files — the poor man's Z-order, exact for one key (for two keys the
    * lexicographic range still prunes on the leading key).
    *
    * This is the high-cardinality complement to [[writePartitioned]]:
    * directory partitioning on a high-cardinality key (user_id, doc_id)
    * would create millions of tiny directories; clustering keeps file
    * count = `files` and moves the pruning into row-group stats, which
    * Spark's parquet reader applies under `spark.sql.parquet.filterPushdown`
    * (on by default; `PushedFilters` in `.explain` shows the predicates
    * that reach the footer check). ClusteredWriteSpec proves the
    * pairwise-disjoint file ranges the pruning relies on. */
  def writeRangeClustered(df: DataFrame, path: String, files: Int,
                          keys: String*): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(files, keys.map(col): _*)
      .sortWithinPartitions(keys.head, keys.tail: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Sorted parquet write with bounded row-group size: the INTRA-file
    * twin of [[writeRangeClustered]]. Each output file is sorted on
    * `keys` and cut into row groups of ≤ `blockBytes`
    * (`parquet.block.size`), so consecutive row groups cover disjoint key
    * ranges and the reader's footer check skips every group a predicate
    * can't touch — pruning INSIDE a file, where file-level clustering
    * can't reach. The lever matters at scale: with the default 128 MB
    * groups a 1 GB file has 8 prune units; at 8 MB it has 128. Smaller
    * groups cost some scan throughput (more page headers, worse
    * compression) — size them to the selectivity of the expected
    * predicates, not to a constant. ClusteredWriteSpec proves the
    * disjointness and the 1-of-N group overlap from the parquet footer
    * itself. */
  def writeRowGrouped(df: DataFrame, path: String, files: Int,
                      blockBytes: Long, keys: String*): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(files, keys.map(col): _*)
      .sortWithinPartitions(keys.head, keys.tail: _*)
      .write.mode("overwrite")
      .option("parquet.block.size", blockBytes.toString)
      .parquet(path)
  }

  /** Z-ordered parquet write: range-cluster on the Morton interleaving of
    * TWO dimensions, so a predicate on EITHER dimension alone skips most
    * files (each file covers ~√files of each axis). The lexicographic
    * [[writeRangeClustered]] prunes perfectly on the leading key but not
    * at all on the second alone — Z-order trades a little of the first
    * axis's locality for real locality on both. `exprA`/`exprB` must be
    * bigint-valued and pre-normalized into [0, 2^31) (ranks, epoch
    * seconds, bucketed doubles); see `zorder_key`'s masking note.
    */
  def writeZOrdered(df: DataFrame, path: String, files: Int,
                    exprA: String, exprB: String): Unit = {
    import org.apache.spark.sql.functions.{col, expr}
    // withColumn would silently REPLACE (and the final drop delete) a
    // legitimate user column of this name — refuse instead of losing data
    require(!df.columns.contains("_zkey"),
      "input already has a _zkey column; rename it before writeZOrdered")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    df.withColumn("_zkey", expr(s"zorder_key($exprA, $exprB)"))
      .repartitionByRange(files, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** [[writeZOrdered]]'s twin on the HILBERT curve (`hilbert_key`):
    * same two-axis clustering contract and the same pre-normalization
    * requirement, but every output file covers one CONNECTED plane
    * region (the curve never jumps at cell seams), so per-file min/max
    * boxes are as tight as a linear order can make them. */
  def writeHilbertClustered(df: DataFrame, path: String, files: Int,
                            exprA: String, exprB: String): Unit = {
    import org.apache.spark.sql.functions.{col, expr}
    require(!df.columns.contains("_hkey"),
      "input already has a _hkey column; rename it before writeHilbertClustered")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    df.withColumn("_hkey", expr(s"hilbert_key($exprA, $exprB)"))
      .repartitionByRange(files, col("_hkey"))
      .sortWithinPartitions("_hkey")
      .drop("_hkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Parquet write with per-column BLOOM FILTERS in the footer — the
    * last rung of the pruning ladder this module builds: file-level key
    * ranges ([[writeRangeClustered]]) → row-group min/max
    * ([[writeRowGrouped]]) → per-group bloom headers (this). The first
    * two only prune on columns the data is SORTED by; a point lookup on
    * any other column finds every group's min/max spanning ~the whole
    * domain and prunes nothing. A bloom header answers "is this exact
    * value possibly in this group" independently of sort order — absence
    * proof for the values that aren't there (no false negatives, sized
    * false positives), which is most values in a selective point query.
    *
    * `ndvPerCol` maps column → expected distinct values PER ROW GROUP;
    * parquet sizes each group's filter from it (too low inflates the
    * false-positive rate — absent values stop pruning; too high wastes
    * footer bytes). Composes with [[writeRowGrouped]]'s `blockBytes`
    * lever: sort by the range key, bloom the lookup keys.
    *
    * Options ride Spark's normal parquet write configuration
    * (`parquet.bloom.filter.enabled#<col>` — public parquet-mr/Spark
    * surface), so they apply per-write, not session-wide. */
  def writeBloomFiltered(df: DataFrame, path: String,
                         ndvPerCol: Map[String, Long]): Unit = {
    require(ndvPerCol.nonEmpty, "no bloom columns requested")
    val missing = ndvPerCol.keySet -- df.columns.toSet
    require(missing.isEmpty, s"bloom columns absent from input: ${missing.mkString(", ")}")
    val w = df.write.mode("overwrite")
    ndvPerCol.foldLeft(w) { case (acc, (c, ndv)) =>
      require(ndv > 0, s"expected ndv must be positive for $c: $ndv")
      acc.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }.parquet(path)
  }
}
