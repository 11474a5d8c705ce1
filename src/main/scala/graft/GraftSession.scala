package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale defaults (SURVEY.md §7.1 M6).
  * Local runs parameterize core count; on a real cluster the same builder
  * applies — only master/deploy settings differ.
  */
object GraftSession {

  /** @param cores      parallelism for local mode; shuffle partitions
    *                   follow it (a 200-partition default on a 4-core
    *                   local run means 50 waves of tiny tasks; on a real
    *                   cluster size this to 2-3× total executor cores
    *                   and let AQE coalesce down)
    */
  def builder(appName: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new GraftExtensions)
      // shuffle sizing: match available parallelism, let AQE coalesce
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // runtime skew-join splitting: oversized partitions are divided at
      // the exchange instead of stalling one task
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // ~128 MiB scan splits: big enough to amortize open/footer cost,
      // small enough that a task's working set fits executor memory
      .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
      // the events table is parquet TIMESTAMP(NANOS); read as long, the
      // Tables loader normalizes to microsecond timestamps
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // cross-engine determinism: one wall-clock zone everywhere
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
}
