package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.mr.MapReduce
import graft.mr.MapReduce.{HashPartition, SortedPartition32}

/** The two reference applications as library calls over the typed MR
  * surface — exact observable-output parity with the golden corpus
  * (`/root/reference/map___reduce/tests/`), minus the reference's
  * nondeterminism (thread ids, emission interleaving), which its own
  * parser strips (`wordcount_parser.py:40-41`).
  */
object TextPipeline {

  /** `wordcount` app (O11, `/root/reference/map___reduce/wordcount.c:9-40`):
    * key = whole input line, value = "1", reduce = sum of atoi(value).
    * Canonical output (what the reference's parser prints): `key count`
    * lines sorted by key.
    */
  def wordCount(
      spark: SparkSession,
      files: Seq[String],
      numPartitions: Int = 32,
      numMappers: Int = 0): DataFrame = {
    val kv = MapReduce.run(
      spark, files,
      mapper = line => Iterator((line, "1")),
      reducer = (key, values) => {
        var count = 0L
        while (values.hasNext) count += values.next().toLong
        Iterator((key, count.toString))
      },
      numPartitions = numPartitions,
      partitioner = HashPartition,
      numMappers = numMappers)
    kv.toDF("key", "cnt").orderBy("key")
  }

  /** `sort` app (O12, `/root/reference/map___reduce/sort.c:9-36`): key =
    * whole line, reduce drains duplicates and emits the key once ⇒
    * DISTINCT; output order = (SortedPartition32 bucket asc, then
    * lexicographic) — byte-identical to `tests/{1,11,23}.out` including
    * the atoi-overflow bucket placement.
    */
  def distinctSorted(
      spark: SparkSession,
      files: Seq[String],
      numPartitions: Int = 1,
      numMappers: Int = 0): Dataset[String] = {
    import spark.implicits._
    val kv = MapReduce.run(
      spark, files,
      mapper = line => Iterator((line, "dummy")),
      reducer = (key, values) => {
        while (values.hasNext) values.next() // drain the duplicate run
        Iterator((key, ""))
      },
      numPartitions = numPartitions,
      partitioner = SortedPartition32,
      numMappers = numMappers)
    kv.toDF("key", "v")
      .orderBy(MapReduce.sortedBucket32(col("key"), numPartitions), col("key"))
      .select("key").as[String]
  }
}
