package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: pre-shuffle data ONCE at write time so every later
  * equi-join/aggregation on the bucket key runs exchange-free.
  *
  * At 100 TB this is the difference between shuffling the fact table on
  * every query and never shuffling it again: `bucketBy(n, key)` fixes the
  * partitioning function (hash(key) mod n) in the table layout, and
  * `sortBy(key)` pre-sorts each bucket so a sort-merge join needs neither
  * an Exchange nor a Sort. Both join sides must use the same bucket count
  * and key.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two same-bucketing tables on their bucket keys — plans as
    * SortMergeJoin with no Exchange on either side. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
