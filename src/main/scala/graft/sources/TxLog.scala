package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal log-structured versioned table — the storage idea under
  * Delta/Iceberg/Hudi (public protocol concept: an ordered commit log
  * of add/remove-FILE actions over immutable parquet data files),
  * reduced to what a single-writer pipeline needs:
  *
  *  - `append` writes parquet files and commits their paths as adds;
  *  - `read` replays the log to the requested version and reads
  *    exactly the live file set — TIME TRAVEL is replaying a prefix;
  *  - `compact` rewrites the live set as one commit that adds the
  *    compacted files and removes the old ones — readers at older
  *    versions still see the old files (immutability is the point).
  *
  * Why it belongs in this engine: [[graft.operators.Merge]] and
  * snapshot diff manufacture CHANGE SETS, [[graft.streaming.StreamingCdc]]
  * applies them continuously — a versioned table is where those land,
  * with reproducible "train on yesterday's snapshot" reads (version
  * pinning is lineage for a 100 TB corpus).
  *
  * Scale shape: the LOG is driver-side (one tiny JSON file per commit,
  * listed and replayed in version order — bounded by commit count, the
  * same contract real lakehouse clients have), while the DATA path
  * never leaves executors: reads are a plain multi-file parquet scan of
  * the live set (pushdown/pruning intact), writes are normal
  * distributed parquet writes. Single-writer by contract — no
  * optimistic-concurrency loop; real deployments use a full lakehouse
  * format.
  *
  * Commit format: `_log/%08d.json`, one action per line:
  * `{"a":"add","p":"<relative path>"}` / `{"a":"remove","p":"..."}`.
  */
object TxLog {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(table: String) = new Path(table, "_log")

  /** Sorted commit versions present in the log. */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val dir = logDir(table)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .sorted
  }

  private def writeCommit(spark: SparkSession, table: String, version: Long,
                          adds: Seq[String], removes: Seq[String]): Unit = {
    val dir = logDir(table)
    val f = fs(spark, dir)
    val path = new Path(dir, f"$version%08d.json")
    require(!f.exists(path), s"txlog: version $version already committed")
    val out = f.create(path, false)
    try {
      val lines =
        adds.map(p => s"""{"a":"add","p":"$p"}""") ++
          removes.map(p => s"""{"a":"remove","p":"$p"}""")
      out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    } finally out.close()
  }

  private def watermarkPath(table: String) =
    new Path(logDir(table), "_vacuum_watermark")

  /** Earliest version still readable (0 until a vacuum raises it). */
  def earliestReadableVersion(spark: SparkSession, table: String): Long = {
    val p = watermarkPath(table)
    val f = fs(spark, p)
    if (!f.exists(p)) 0L
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  /** Replay the log up to and including `asOf` (default: latest);
    * returns the live RELATIVE file paths in first-added order. */
  def snapshotFiles(spark: SparkSession, table: String,
                    asOf: Option[Long] = None): Seq[String] = {
    val vs = versions(spark, table)
    val upTo = asOf.fold(vs)(v => vs.filter(_ <= v))
    require(asOf.isEmpty || upTo.nonEmpty || vs.isEmpty,
      s"txlog: no commits at or before version ${asOf.get}")
    val f = fs(spark, logDir(table))
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    for (v <- upTo) {
      val path = new Path(logDir(table), f"$v%08d.json")
      val in = f.open(path)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      for (line <- text.linesIterator if line.nonEmpty) {
        // fixed two-field format written by writeCommit — a tiny
        // hand-rolled parse keeps the log dependency-free
        val action = line.split("\"")(3)
        val p = line.split("\"")(7)
        if (action == "add") live += p
        else if (action == "remove") live -= p
        else throw new IllegalArgumentException(s"txlog: bad action in $path: $line")
      }
    }
    live.toSeq
  }

  /** Append `df` as a new commit; returns the committed version. */
  def append(spark: SparkSession, table: String, df: DataFrame): Long = {
    val version = versions(spark, table).lastOption.fold(0L)(_ + 1)
    val rel = f"data/v$version%08d"
    val dataDir = new Path(table, rel)
    df.write.parquet(dataDir.toString)
    val f = fs(spark, dataDir)
    val files = f.listStatus(dataDir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
      .sorted
      .map(n => s"$rel/$n")
    writeCommit(spark, table, version, adds = files, removes = Seq.empty)
    version
  }

  /** Read the table at `asOf` (default: latest snapshot). An empty
    * snapshot needs a schema to produce an empty frame, so it throws —
    * honest for a data table. */
  def read(spark: SparkSession, table: String,
           asOf: Option[Long] = None): DataFrame = {
    val wm = earliestReadableVersion(spark, table)
    require(asOf.forall(_ >= wm),
      s"txlog: version ${asOf.get} was vacuumed (earliest readable: $wm)")
    val files = snapshotFiles(spark, table, asOf)
    require(files.nonEmpty, s"txlog: empty snapshot for $table at $asOf")
    spark.read.parquet(files.map(p => new Path(table, p).toString): _*)
  }

  /** One commit that writes `df` and swaps it in for the entire
    * current live set. Shared by [[compact]] (df = current snapshot)
    * and [[overwrite]] (df = a new snapshot, e.g. a MERGE result). */
  private def replaceCommit(spark: SparkSession, table: String,
                            df: DataFrame, tag: String): Long = {
    val version = versions(spark, table).last + 1
    val rel = f"data/v$version%08d-$tag"
    val dataDir = new Path(table, rel)
    df.write.parquet(dataDir.toString)
    val f = fs(spark, dataDir)
    val files = f.listStatus(dataDir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
      .sorted
      .map(n => s"$rel/$n")
    writeCommit(spark, table, version,
      adds = files, removes = snapshotFiles(spark, table))
    version
  }

  /** Rewrite the current live set as one compacted commit (adds the
    * new files, removes every old one). Readers pinned to older
    * versions are untouched — data files are immutable. Returns the
    * compaction's version. */
  def compact(spark: SparkSession, table: String,
              numFiles: Int = 1): Long =
    replaceCommit(spark, table,
      read(spark, table).repartition(numFiles), "compact")

  /** Replace the table's contents with `df` in one commit — how a
    * [[graft.operators.Merge.mergeUpsert]] result (or any recomputed
    * snapshot) LANDS as a new version while every older version stays
    * readable: the copy-on-write transaction, with the old snapshot as
    * free time travel. */
  def overwrite(spark: SparkSession, table: String, df: DataFrame): Long =
    replaceCommit(spark, table, df, "overwrite")

  /** Reclaim data files no retained version references — the storage
    * half of the lifecycle: without it a copy-on-write table only ever
    * GROWS (every compaction/overwrite leaves the full old snapshot on
    * disk), which is exactly the cost that matters at 100 TB. Retains
    * the last `retainLast` versions' file sets; anything referenced
    * ONLY by older versions is deleted, and the read watermark rises so
    * a time travel into the vacuumed range fails LOUDLY at the API
    * (not with a missing-file scan error mid-job). The log files
    * themselves stay (tiny, and replay needs the full prefix). */
  def vacuum(spark: SparkSession, table: String,
             retainLast: Int = 1): Seq[String] = {
    require(retainLast >= 1, "txlog: must retain at least the latest version")
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"txlog: nothing to vacuum in $table")
    val retained = vs.takeRight(retainLast)
    val referenced = retained
      .flatMap(v => snapshotFiles(spark, table, Some(v))).toSet
    val dataRoot = new Path(table, "data")
    val f = fs(spark, dataRoot)
    // qualify BOTH sides before relativizing: listFiles returns
    // scheme-qualified paths (file:/…) while `table` is usually bare —
    // a scheme mismatch would relativize to the absolute path, match
    // nothing, and delete the retained files too (the spec pins this)
    val rootPrefix = f.makeQualified(new Path(table)).toString + "/"
    val removed = scala.collection.mutable.ArrayBuffer.empty[String]
    if (f.exists(dataRoot)) {
      val it = f.listFiles(dataRoot, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
          val full = st.getPath.toString
          require(full.startsWith(rootPrefix),
            s"txlog: data file $full outside table root $rootPrefix")
          val rel = full.stripPrefix(rootPrefix)
          if (!referenced.contains(rel)) { f.delete(st.getPath, false); removed += rel }
        }
      }
    }
    val wp = watermarkPath(table)
    val out = f.create(wp, true)
    try out.write(retained.head.toString.getBytes("UTF-8")) finally out.close()
    removed.toSeq.sorted
  }

  /** `foreachBatch` adapter: every micro-batch lands as one versioned
    * append — the streaming-ingest sink for a versioned table (each
    * commit is a replayable offset: "train on everything up to version
    * V" is reproducible even while the stream keeps writing). Empty
    * micro-batches are skipped, so versions always carry data.
    *
    * Usage: `stream.writeStream.foreachBatch(TxLog.appendSink(table)).start()` */
  def appendSink(table: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) { append(batch.sparkSession, table, batch); () }

  /** Drop the table directory (test/fixture reset). */
  def destroy(spark: SparkSession, table: String): Unit = {
    val p = new Path(table)
    val f = fs(spark, p)
    if (f.exists(p)) f.delete(p, true)
  }
}
