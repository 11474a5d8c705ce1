package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale defaults (SURVEY.md §7.1 M6).
  * The local[cores] master is a FALLBACK: when a master is already
  * configured (spark-submit --master sets the `spark.master` system
  * property / SPARK_MASTER env), the builder leaves it alone, so the same
  * entry points run unchanged on a real cluster instead of silently
  * dropping into local mode.
  */
object GraftSession {

  /** @param cores      parallelism for local mode; shuffle partitions
    *                   follow it (a 200-partition default on a 4-core
    *                   local run means 50 waves of tiny tasks; on a real
    *                   cluster size this to 2-3× total executor cores
    *                   and let AQE coalesce down)
    */
  def builder(appName: String, cores: Int): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      // shuffle sizing: match available parallelism, let AQE coalesce
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // parallelismFirst deliberately stays at its default (true): the
      // r16 optimization round A/B-measured size-based coalescing
      // (false, the Spark-doc recommendation for clusters) and it lost
      // uniformly at this tier — 1.06-1.82x across a 16-row mixed
      // subset — because coalescing a tiny-bytes shuffle to one
      // advisory-sized partition serializes downstream CPU-heavy work
      // (pair joins, codec sorts) that parallelism-first spreads across
      // cores. On a real cluster revisit with
      // spark.sql.adaptive.advisoryPartitionSizeInBytes sized to the
      // tier (guide §2.2).
      // runtime skew-join splitting: oversized partitions are divided at
      // the exchange instead of stalling one task
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // ~128 MiB scan splits: big enough to amortize open/footer cost,
      // small enough that a task's working set fits executor memory
      .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
      // cross-engine determinism: one wall-clock zone everywhere
      // (also makes the events loader's TIMESTAMP_NTZ→instant cast
      // lossless — see Tables.events)
      .config("spark.sql.session.timeZone", "UTC")
      // keep parquet TIMESTAMP(NANOS) readable as LongType nanos: the
      // driver's events regen has shipped NANOS before (round ≤7), and
      // without this flag such a file fails at read (PARQUET_TYPE_ILLEGAL)
      // before Tables.events' LongType normalization branch can run.
      // Harmless for µs/instant encodings — the flag only affects NANOS.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Long-running-session hygiene: ContextCleaner is WEAK-REF driven —
      // broadcast/shuffle/accumulator state is only released after a
      // driver GC collects the reference, and on a large heap full GCs
      // can be minutes apart. Hundreds of executions then stack their
      // broadcast blocks in block-manager storage and tax every later
      // query with eviction/GC pressure (measured on the 64× tier:
      // qd_containment 48 s mid-pack vs 19 s isolated; with this
      // interval 25 s — see PERF.md round 9). The default is 30 min,
      // longer than an entire bench pack; 2 min bounds the backlog at a
      // cost of one periodic driver GC — unlike a per-query System.gc(),
      // which was measured and rejected (264 full GCs cost more than the
      // backlog they retire).
      .config("spark.cleaner.periodicGC.interval", "2min")
      // SQL surface for TxLog tables: SELECT ... FROM graft.`/path`
      // [VERSION AS OF v | TIMESTAMP AS OF ts] (see TxLogCatalog)
      .config("spark.sql.catalog.graft", "graft.sources.TxLogCatalog")
      .config("spark.ui.enabled", "false")
    if (sys.props.contains("spark.master") || sys.env.contains("SPARK_MASTER"))
      b
    else b.master(s"local[$cores]")
  }
}
