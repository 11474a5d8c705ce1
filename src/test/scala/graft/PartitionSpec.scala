package graft

import org.apache.spark.sql.functions._
import graft.sources.TxLog

/** Hive-style partition recording ([[TxLog.appendPartitioned]]), pinned:
  * value-only pruning, mixed partitioned/plain appends (absence never
  * skips), special-character values, null rejection, and checkpoint
  * replay survival of the recorded values. */
class PartitionSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(n: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-part-$n").toString + "/t"

  test("partition values prune files by the log alone; a plain append can never be skipped") {
    val t = fresh("prune")
    TxLog.appendPartitioned(spark, t,
      Seq(("de", 1L), ("en", 2L), ("fr", 3L)).toDF("lang", "v"), "lang")
    TxLog.append(spark, t, Seq(("de", 4L)).toDF("lang", "v")) // unrecorded
    val (kept, live) = TxLog.pruneFilesPartition(spark, t, "lang", "de")
    assert(live == 4 && kept.size == 2,
      "the de partition file AND the value-less plain file must be kept")
    assert(TxLog.readWherePartition(spark, t, "lang", "de")
      .collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 4L))
    // a value nobody wrote keeps only the unprunable plain file, and the
    // residual filter still returns zero rows
    assert(TxLog.readWherePartition(spark, t, "lang", "zz").isEmpty)
  }

  test("partition values survive Hive path escaping and checkpoint replay") {
    val t = fresh("esc")
    // ':' and ' ' are path-escaped by the partitioned writer
    TxLog.appendPartitioned(spark, t,
      Seq(("a:b c", 1L), ("plain", 2L)).toDF("k", "v"), "k")
    assert(TxLog.partitionValuesAt(spark, t, "k").values.toSet
      == Set("a:b c", "plain"))
    // push past the checkpoint cadence; the values must replay from it
    (1L to TxLog.checkpointEvery).foreach(i =>
      TxLog.appendPartitioned(spark, t, Seq(("plain", i)).toDF("k", "v"), "k"))
    assert(TxLog.checkpointVersions(spark, t).nonEmpty)
    val pv = TxLog.partitionValuesAt(spark, t, "k")
    assert(pv.values.toSet == Set("a:b c", "plain"))
    assert(TxLog.readWherePartition(spark, t, "k", "a:b c")
      .collect().map(_.getLong(1)).toSeq == Seq(1L))
  }

  test("multi-level partitioning: per-level values recorded, equalities compose, nesting on disk") {
    val t = fresh("multi")
    TxLog.appendPartitionedBy(spark, t,
      Seq(("de", "web", 1L), ("de", "book", 2L), ("en", "web", 3L),
        ("en", "book", 4L)).toDF("lang", "src", "v"),
      Seq("lang", "src"))
    val (keptLang, live) = TxLog.pruneFilesPartition(spark, t, "lang", "de")
    assert(live == 4 && keptLang.size == 2)
    val rows = TxLog.readWherePartitionAll(spark, t,
      Seq(("lang", "de"), ("src", "web")))
      .collect().map(_.getLong(2)).toSeq
    assert(rows == Seq(1L), "both equality rungs must compose")
    // the layout really nests on disk
    assert(TxLog.snapshotFiles(spark, t)
      .forall(p => p.contains("_g_pv=") && p.contains("_g_pv1=")))
  }

  test("compactPartitioned preserves pruning where plain compact degrades it") {
    val t = fresh("compactp")
    (0 to 2).foreach(i => TxLog.appendPartitioned(spark, t,
      Seq(("de", i * 10L), ("en", i * 10L + 1L), ("fr", i * 10L + 2L))
        .toDF("lang", "v"), "lang"))
    assert(TxLog.pruneFilesPartition(spark, t, "lang", "de")._1.size == 3)
    val rowsBefore = TxLog.read(spark, t).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val cv = TxLog.compactPartitioned(spark, t, Seq("lang"))
    assert(TxLog.commitKind(spark, t, cv).contains("compact"))
    val (kept, liveAfter) = TxLog.pruneFilesPartition(spark, t, "lang", "de")
    assert(liveAfter == 3, "one file per partition value after compaction")
    assert(kept.size == 1, "pruning must keep working on the compacted layout")
    assert(TxLog.read(spark, t).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq == rowsBefore,
      "partitioned compaction must be row-invisible")
    assert(TxLog.readWherePartition(spark, t, "lang", "de")
      .collect().map(_.getLong(1)).sorted.toSeq == Seq(0L, 10L, 20L))
  }

  test("deletePartition: recorded files drop as pure metadata; unrecorded files CoW; no-ops are commit-free") {
    val t = fresh("drop")
    TxLog.appendPartitioned(spark, t,
      Seq(("de", 1L), ("de", 2L), ("en", 3L)).toDF("k", "v"), "k")
    TxLog.append(spark, t, Seq(("de", 4L), ("en", 5L)).toDF("k", "v")) // unrecorded
    val before = TxLog.snapshotFiles(spark, t)
    val deFiles = TxLog.partitionValuesAt(spark, t, "k")
      .collect { case (p, "de") => p }.toSet
    val v = TxLog.deletePartition(spark, t, "k", "de")
    val after = TxLog.snapshotFiles(spark, t).toSet
    assert(deFiles.forall(!after.contains(_)), "recorded de files must be removed")
    assert(TxLog.read(spark, t).collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == Set(("en", 3L), ("en", 5L)))
    assert(TxLog.commitKind(spark, t, v).contains("delete"))
    // time travel keeps the dropped partition
    assert(TxLog.read(spark, t, Some(v - 1)).count() == 5L)
    // MatView folds the drop signed (a CoW delete through the CDF)
    val mv = fresh("drop-mv")
    assert(graft.operators.MatView.refresh(spark, t, mv, Seq("k"), "v") == "build")
    TxLog.appendPartitioned(spark, t, Seq(("fr", 9L)).toDF("k", "v"), "k")
    assert(graft.operators.MatView.refresh(spark, t, mv, Seq("k"), "v") == "incremental")
    TxLog.deletePartition(spark, t, "k", "fr")
    assert(graft.operators.MatView.refresh(spark, t, mv, Seq("k"), "v") == "incremental-delete")
    assert(TxLog.read(spark, mv).collect().map(_.getString(0)).toSet == Set("en"))
    // a value nobody holds is a commit-free no-op... except the honest
    // CoW probe of value-less files finds nothing and stays commit-free
    val head = TxLog.latestVersion(spark, t)
    assert(TxLog.deletePartition(spark, t, "k", "zz") == head)
    // PURE-metadata case: drop when every live file carries a value
    val t2 = fresh("drop-meta")
    TxLog.appendPartitioned(spark, t2,
      Seq(("de", 1L), ("en", 2L)).toDF("k", "v"), "k")
    val dv = TxLog.deletePartition(spark, t2, "k", "de")
    val h = TxLog.history(spark, t2).filter(col("version") === dv).head()
    assert(h.getAs[Int]("n_adds") == 0,
      "a fully-recorded drop must write nothing")
    assert(TxLog.read(spark, t2).collect().map(_.getString(0)).toSeq == Seq("en"))
  }

  test("null partition values are rejected loudly; dv deletes anti-apply on partition reads") {
    val t = fresh("nulldv")
    val e = intercept[IllegalArgumentException] {
      TxLog.appendPartitioned(spark, t,
        Seq((Some("x"), 1L), (None, 2L)).toDF("k", "v"), "k")
    }
    assert(e.getMessage.contains("non-null partition column"))
    val t2 = fresh("dv")
    TxLog.appendPartitioned(spark, t2,
      Seq(("de", 1L), ("de", 2L), ("en", 3L)).toDF("k", "v"), "k")
    TxLog.deleteWhereMorExpr(spark, t2, "v = 1")
    assert(TxLog.readWherePartition(spark, t2, "k", "de")
      .collect().map(_.getLong(1)).toSeq == Seq(2L))
  }
}
