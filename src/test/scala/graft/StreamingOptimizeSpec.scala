package graft

import org.apache.spark.sql.functions.col
import graft.sources.TxLog
import graft.streaming.StreamingOptimize

/** Continuous small-file maintenance: the live file count stays bounded
  * while streaming ingest keeps committing micro-batch-sized files, and
  * the packs are row-invisible (reads exact, MV folds stay incremental). */
class StreamingOptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(n: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-sopt-$n").toString + "/t"

  test("maintain packs the small-file tail as commits arrive; rows and MV folds untouched") {
    val t = fresh("pack")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sopt-ckpt").toString
    // one already-large file the packs must never touch
    TxLog.append(spark, t, (0L until 4000L).map(i => (i, s"row$i")).toDF("id", "s").coalesce(1))
    val big = TxLog.snapshotFiles(spark, t).head
    val bigLen = new java.io.File(t, big).length()
    // an MV that must stay incremental across every pack
    val mv = fresh("pack-mv")
    assert(graft.operators.MatView.refresh(spark, t, mv, Seq("s"), "id") == "build")
    val q = StreamingOptimize.maintain(spark, t, targetBytes = bigLen, ckpt)
    try {
      // streaming-shaped ingest: eight tiny commits dribble in
      (0 until 8).foreach { r =>
        TxLog.append(spark, t,
          Seq((10000L + r, s"tiny$r")).toDF("id", "s").coalesce(1))
      }
      q.processAllAvailable()
      val live = TxLog.snapshotFiles(spark, t)
      assert(live.contains(big), "maintenance touched the large file")
      assert(live.size < 1 + 8,
        s"maintenance never packed the tail: ${live.size} live files")
      assert(TxLog.read(spark, t).count() == 4008L, "packing changed rows")
      // every pack was a compaction in the MV's eyes: fold stays exact
      assert(graft.operators.MatView.refresh(spark, t, mv, Seq("s"), "id")
        == "incremental")
      assert(TxLog.read(spark, mv).agg(org.apache.spark.sql.functions.sum("cnt"))
        .head().getLong(0) == 4008L)
      // and more ingest after the packs keeps composing
      TxLog.append(spark, t, Seq((20000L, "late")).toDF("id", "s").coalesce(1))
      q.processAllAvailable()
      assert(TxLog.read(spark, t).count() == 4009L)
    } finally q.stop()
  }

  test("deleteWhereMorExpr: free-predicate GDPR erasure binds vectors without touching files") {
    val t = fresh("expr")
    TxLog.append(spark, t,
      Seq((1L, "alice", 10L), (2L, "bob", 20L), (3L, "alice", 30L),
        (4L, "carol", 40L)).toDF("id", "user", "v"))
    val before = TxLog.snapshotFiles(spark, t)
    // erase one subject across the whole table — no stats, no clustering
    val v = TxLog.deleteWhereMorExpr(spark, t, "user = 'alice' AND v > 5")
    assert(TxLog.snapshotFiles(spark, t) == before,
      "free-predicate MOR delete must not touch data files")
    assert(TxLog.read(spark, t).collect().map(_.getLong(0)).toSet == Set(2L, 4L))
    // composes with a prior range mask and with rename (logical names)
    TxLog.renameColumn(spark, t, "user", "subject")
    TxLog.deleteWhereMorExpr(spark, t, "subject = 'carol'")
    assert(TxLog.read(spark, t).collect().map(_.getLong(0)).toSet == Set(2L))
    // no-match predicate is a commit-free no-op
    val head = TxLog.latestVersion(spark, t)
    assert(TxLog.deleteWhereMorExpr(spark, t, "subject = 'nobody'") == head)
    assert(TxLog.latestVersion(spark, t) == head)
    // pinned pre-delete read unaffected
    assert(TxLog.read(spark, t, Some(v - 1)).count() == 4L)
  }
}
