package graft

import org.apache.spark.sql.functions.col
import graft.sources.TxLog

class TxLogSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): String = {
    val t = java.nio.file.Files.createTempDirectory(s"graft-txlog-$name").toString + "/t"
    t
  }

  test("append/read lifecycle: versions accumulate, latest sees everything") {
    val t = freshTable("life")
    val v0 = TxLog.append(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val v1 = TxLog.append(spark, t, Seq((3L, "c")).toDF("id", "s"))
    assert(v0 == 0L && v1 == 1L)
    assert(TxLog.versions(spark, t) == Seq(0L, 1L))
    val got = TxLog.read(spark, t).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("time travel: reading at an old version replays only that prefix") {
    val t = freshTable("tt")
    TxLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"))
    TxLog.append(spark, t, Seq((2L, "b")).toDF("id", "s"))
    TxLog.append(spark, t, Seq((3L, "c")).toDF("id", "s"))
    val atV1 = TxLog.read(spark, t, asOf = Some(1L))
      .collect().map(_.getLong(0)).toSet
    assert(atV1 == Set(1L, 2L), s"version 1 must not see commit 2: $atV1")
    val atV0 = TxLog.read(spark, t, asOf = Some(0L))
      .collect().map(_.getLong(0)).toSet
    assert(atV0 == Set(1L))
  }

  test("compaction rewrites the live set; pinned readers still see the old files") {
    val t = freshTable("compact")
    TxLog.append(spark, t, (1L to 50L).map(i => (i, s"x$i")).toDF("id", "s"))
    TxLog.append(spark, t, (51L to 80L).map(i => (i, s"x$i")).toDF("id", "s"))
    val preFiles = TxLog.snapshotFiles(spark, t)
    val cv = TxLog.compact(spark, t)
    // latest: same rows, fewer (one) files, all from the compaction
    val postFiles = TxLog.snapshotFiles(spark, t)
    assert(postFiles.size == 1 && postFiles.forall(_.contains("-compact")),
      postFiles.toString)
    val latest = TxLog.read(spark, t).collect().map(_.getLong(0)).toSet
    assert(latest == (1L to 80L).toSet)
    // a reader pinned BEFORE the compaction replays the original files
    assert(TxLog.snapshotFiles(spark, t, asOf = Some(cv - 1)) == preFiles)
    assert(TxLog.read(spark, t, asOf = Some(cv - 1))
      .collect().map(_.getLong(0)).toSet == (1L to 80L).toSet)
  }

  test("overwrite lands a MERGE result as a new version; the old snapshot stays readable") {
    import graft.operators.Merge
    val t = freshTable("merge")
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    TxLog.append(spark, t, base)
    // change batch: update k=2, delete k=3, insert k=4
    val batch = Seq((2L, 21.0, false), (3L, 30.0, true), (4L, 40.0, false))
      .toDF("k", "v", "_delete")
    val merged = Merge.mergeUpsert(TxLog.read(spark, t), batch,
      Seq("k"), Some("_delete"))
    val mv = TxLog.overwrite(spark, t, merged)
    val latest = TxLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(latest == Set((1L, 10.0), (2L, 21.0), (4L, 40.0)), latest.toString)
    // time travel to the pre-merge version: the original rows, untouched
    val before = TxLog.read(spark, t, asOf = Some(mv - 1)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(before == Set((1L, 10.0), (2L, 20.0), (3L, 30.0)), before.toString)
  }

  test("empty snapshot and double-commit fail loudly") {
    val t = freshTable("err")
    intercept[IllegalArgumentException](TxLog.read(spark, t))
    TxLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"))
    // destroy resets completely: versions restart at 0
    TxLog.destroy(spark, t)
    assert(TxLog.versions(spark, t).isEmpty)
    val v = TxLog.append(spark, t, Seq((9L, "z")).toDF("id", "s"))
    assert(v == 0L)
  }

  test("appendSink: each micro-batch is one versioned commit; the union is the stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = freshTable("sink")
    val stream = MemoryStream[(Long, String)](spark)
    val q = stream.toDF().toDF("id", "s")
      .writeStream.foreachBatch(TxLog.appendSink(t)).outputMode("append").start()
    try {
      stream.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      stream.addData((3L, "c"))
      q.processAllAvailable()
      assert(TxLog.versions(spark, t) == Seq(0L, 1L))
      assert(TxLog.read(spark, t).collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
      // the mid-stream version is a stable training snapshot
      assert(TxLog.read(spark, t, asOf = Some(0L))
        .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    } finally q.stop()
  }

  test("vacuum reclaims unreferenced files; vacuumed versions fail loudly at the API") {
    val t = freshTable("vac")
    TxLog.append(spark, t, (1L to 40L).map(i => (i, s"x$i")).toDF("id", "s"))
    TxLog.append(spark, t, (41L to 60L).map(i => (i, s"x$i")).toDF("id", "s"))
    val cv = TxLog.compact(spark, t)
    val preRefs = TxLog.snapshotFiles(spark, t, asOf = Some(cv - 1))
    val removed = TxLog.vacuum(spark, t, retainLast = 1)
    // everything only the pre-compaction versions referenced is gone
    assert(removed.toSet == preRefs.toSet, s"removed $removed vs pre $preRefs")
    assert(TxLog.earliestReadableVersion(spark, t) == cv)
    // the retained snapshot is fully intact
    assert(TxLog.read(spark, t).collect().map(_.getLong(0)).toSet == (1L to 60L).toSet)
    // time travel into the vacuumed range is a LOUD API error, not a
    // missing-file scan failure
    val e = intercept[IllegalArgumentException](
      TxLog.read(spark, t, asOf = Some(cv - 1)))
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
    // vacuum with everything retained removes nothing
    assert(TxLog.vacuum(spark, t, retainLast = 10).isEmpty)
  }

  test("qwTxlogRead: the full lifecycle reads back as exactly the source table") {
    val got = graft.operators.Merge.qwTxlogRead(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = graft.sources.Tables.documents(spark, sfTiny)
      .select("doc_id", "lang").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == want.toSeq,
      s"${got.length} vs ${want.length} rows; first diff: " +
        got.zip(want).find(p => p._1 != p._2).toString)
  }
}
