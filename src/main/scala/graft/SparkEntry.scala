package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator name → (spark, sfDir) → DataFrame; each entry
  * with an `oracleSql` twin is hash-compared against DuckDB on the same
  * parquet tables at sf0.01 (the t2 gate). Entries without an oracle get a
  * weaker rows-only check (non-SQL-expressible ops: LSH, streaming, etc.).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q6: 3-way broadcast join + exact-decimal aggregate. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q6MultiJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, aggregated
    * from the per-family query packs. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ RelationalExt.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      Temporal.queries ++ Graph.queries ++ Sketches.queries ++ Ingest.queries ++
      Merge.queries ++ Constraints.queries ++ Bpe.queries ++ Mpeg1.queries ++
      Mp4.queries ++ H264Pcm.queries ++ H264Cavlc.queries ++ Flac.queries ++
      TextIndex.queries ++ Classifier.queries ++ Skew.queries ++ Pii.queries ++
      MatView.queries ++ Geo.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ RelationalExt.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Multimodal.oracles ++
      Temporal.oracles ++ Graph.oracles ++ Sketches.oracles ++ Ingest.oracles ++
      Merge.oracles ++ Constraints.oracles ++ Bpe.oracles ++ Mpeg1.oracles ++
      Mp4.oracles ++ H264Pcm.oracles ++ H264Cavlc.oracles ++ Flac.oracles ++
      TextIndex.oracles ++ Classifier.oracles ++ Skew.oracles ++ Pii.oracles ++
      MatView.oracles ++ Geo.oracles
}
