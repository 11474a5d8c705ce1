package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.TxLog
import graft.sources.{Tables => T}

/** Incremental MATERIALIZED-VIEW maintenance over a versioned table's
  * change feed — the lakehouse capability that turns "recompute the
  * aggregate nightly over 100 TB" into "fold in the gigabyte that
  * arrived since the last refresh".
  *
  * The view is itself a TxLog table holding `keyCols ++ (cnt, total)`.
  * A refresh:
  *  1. reads the last SOURCE version already folded in — tracked by the
  *     same in-commit (appId, batchId) transaction marker the
  *     exactly-once streaming sinks use ([[TxLog.lastCommittedBatch]]
  *     with batchId = source version), so the applied-watermark can
  *     never desync from the view's own log;
  *  2. pulls ONLY the rows appended since then via [[TxLog.readChanges]]
  *     (compaction commits deliver nothing — skipping them is exact);
  *  3. partially aggregates the delta and folds it into the view
  *     (union + re-aggregate: count and sum are commutative monoids, so
  *     fold-in ≡ recompute — the invariant MatViewSpec pins);
  *  4. lands the new view through [[TxLog.overwriteIdempotent]], so a
  *     replayed/raced refresh of the same source version no-ops.
  *
  * A REWRITE source commit in the unapplied range (overwrite/merge —
  * anything that changes already-delivered rows) cannot be expressed as
  * a delta fold; refresh detects it via the commit tags and falls back
  * to a full recompute, loudly visible in the returned mode. Compactions
  * are NOT rewrites in the change-feed sense and stay incremental.
  *
  * Scale shape: the delta scan is bounded by new data, the view is
  * GROUP-BY-sized (≪ source), and the fold is one small shuffle on the
  * view keys. At 100 TB the only change worth making is landing the
  * fold through [[Merge.mergeIntoPartitioned]] instead of an overwrite
  * when the view itself is large. */
object MatView {

  /** appId for the applied-source-version marker inside the view log. */
  private val MvAppId = "graft-matview"

  /** Aggregate `src`'s live rows AS OF `srcVersion` into a fresh view
    * frame (the full recompute — also the refresh's correctness
    * reference). Pinned: a source commit racing in after the caller
    * captured `srcVersion` must NOT leak into a view stamped with that
    * watermark, or the next incremental refresh would fold it twice. */
  private def fullAggregate(spark: SparkSession, src: String, srcVersion: Long,
                            keyCols: Seq[String], valCol: String): DataFrame =
    TxLog.read(spark, src, Some(srcVersion))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(col(valCol)).as("total"))

  /** Refresh `mv` to cover `src`'s latest version. Returns the refresh
    * mode actually taken: "noop" (already current), "build" (first
    * materialization), "incremental" (delta fold), or "recompute"
    * (rewrite commit in range forced the fallback).
    *
    * Race-exact: every read is PINNED (source at the captured
    * srcLatest; the view at the version whose marker was consulted)
    * and every commit is a CAS — the build goes through
    * [[TxLog.appendIfEmpty]] (exactly one of two concurrent builders
    * lands) and the folds through [[TxLog.overwriteIdempotentAt]]
    * (a commit that raced in between aborts the pinned rewrite). A
    * lost race re-enters refresh on the winner's state, so no source
    * commit can ever be folded twice. */
  def refresh(spark: SparkSession, src: String, mv: String,
              keyCols: Seq[String], valCol: String): String =
    refreshOnce(spark, src, mv, keyCols, valCol, attemptsLeft = 5)

  private def refreshOnce(spark: SparkSession, src: String, mv: String,
                          keyCols: Seq[String], valCol: String,
                          attemptsLeft: Int): String = {
    require(attemptsLeft > 0,
      s"txlog: matview refresh of $mv kept losing commit races — giving up")
    def retry() = refreshOnce(spark, src, mv, keyCols, valCol, attemptsLeft - 1)
    val srcLatest = TxLog.latestVersion(spark, src)
    if (TxLog.versions(spark, mv).isEmpty) {
      if (TxLog.appendIfEmpty(spark, mv,
        fullAggregate(spark, src, srcLatest, keyCols, valCol), MvAppId, srcLatest))
        "build"
      else retry() // another builder won: fold on top of ITS state
    } else {
      val mvBase = TxLog.latestVersion(spark, mv)
      // the marker AS OF the pinned view version — a racer's newer
      // commit must not pair its watermark with our older snapshot
      val applied = TxLog.lastCommittedBatch(spark, mv, MvAppId, Some(mvBase))
        .getOrElse(throw new IllegalStateException(
          s"txlog: $mv carries no $MvAppId marker — not a MatView table"))
      if (applied >= srcLatest) return "noop"
      val range = TxLog.versions(spark, src).filter(v => v > applied && v <= srcLatest)
      // a rewrite commit (removes + non-compact tag, or untagged removes)
      // changes already-folded rows: the delta algebra cannot express it
      val hasRewrite = range.exists { v =>
        val kind = TxLog.commitKind(spark, src, v)
        !kind.contains("compact") && TxLog.commitRemoves(spark, src, v)
      }
      def commitPinned(view: DataFrame, mode: String): String =
        try {
          TxLog.overwriteIdempotentAt(spark, mv, mvBase, view, MvAppId, srcLatest)
          mode
        } catch {
          case _: graft.sources.TxLogConcurrentModificationException => retry()
        }
      if (hasRewrite)
        commitPinned(fullAggregate(spark, src, srcLatest, keyCols, valCol), "recompute")
      else if (range.forall(v => TxLog.commitKind(spark, src, v).contains("compact")))
        // compaction-only range: nothing to fold; the watermark stays and
        // the next delta-bearing refresh covers the wider range exactly
        "noop"
      else {
        val delta = TxLog.readChanges(spark, src, applied, srcLatest)
          .drop("_commit_version")
          .groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("cnt"), sum(col(valCol)).as("total"))
        val folded = TxLog.read(spark, mv, Some(mvBase)).unionByName(delta)
          .groupBy(keyCols.map(col): _*)
          .agg(sum(col("cnt")).as("cnt"), sum(col("total")).as("total"))
        commitPinned(folded, "incremental")
      }
    }
  }

  /** QW — the maintenance lifecycle under the oracle gate: documents
    * lands in three appends with a compaction in the middle; the view
    * (per-lang doc count + char total) is BUILT after the first append
    * and INCREMENTALLY refreshed after each later commit — the final
    * view must hash-match a plain GROUP BY over the whole table, which
    * is exactly the fold-in ≡ recompute claim. */
  def qwMvRefresh(spark: SparkSession, d: String): DataFrame = {
    val docs = T.documents(spark, d).select("doc_id", "lang", "n_chars")
    // per-process slot (Fixtures): a concurrent harness process must
    // never share this live TxLog lifecycle — see Fixtures' scaladoc
    val src = Fixtures.table("mv", d, "src")
    val mv = Fixtures.table("mv", d, "view")
    TxLog.destroy(spark, src); TxLog.destroy(spark, mv)
    TxLog.append(spark, src, docs.filter(col("doc_id") % 3 === 0))
    require(refresh(spark, src, mv, Seq("lang"), "n_chars") == "build")
    TxLog.append(spark, src, docs.filter(col("doc_id") % 3 === 1))
    require(refresh(spark, src, mv, Seq("lang"), "n_chars") == "incremental")
    TxLog.compact(spark, src) // rewrites layout, changes no rows
    require(refresh(spark, src, mv, Seq("lang"), "n_chars") == "noop")
    TxLog.append(spark, src, docs.filter(col("doc_id") % 3 === 2))
    require(refresh(spark, src, mv, Seq("lang"), "n_chars") == "incremental")
    require(refresh(spark, src, mv, Seq("lang"), "n_chars") == "noop") // idempotent
    TxLog.read(spark, mv).select("lang", "cnt", "total").orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qw_mv_refresh" -> qwMvRefresh _)

  val oracles: Map[String, String] = Map(
    "qw_mv_refresh" ->
      ("SELECT lang, COUNT(*) AS cnt, SUM(n_chars) AS total " +
        "FROM documents GROUP BY lang ORDER BY lang"))
}
