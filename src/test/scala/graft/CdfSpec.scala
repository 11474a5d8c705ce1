package graft

import org.apache.spark.sql.functions._
import graft.operators.MatView
import graft.sources.TxLog

/** Row-level change feed ([[TxLog.readChangesCdf]]) and MOR MERGE
  * ([[TxLog.mergeMor]]), pinned: insert/delete image reconstruction per
  * commit kind, compaction invisibility, multiset exactness, and the
  * MatView signed fold (including the min/max repair leg). */
class CdfSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(n: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-cdf-$n").toString + "/t"

  private def changes(t: String): Set[(String, Long, Long, String)] =
    TxLog.readChangesCdf(spark, t, -1L, TxLog.latestVersion(spark, t))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(r.fieldIndex("_commit_version")),
        r.getString(r.fieldIndex("_change_type")))).toSet

  test("append → MOR delete → compact → CoW delete: exact images, compaction invisible") {
    val t = fresh("kinds")
    TxLog.append(spark, t,
      Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)).toDF("k", "v")) // v0
    TxLog.deleteWhereMorExpr(spark, t, "k = 'b'")                     // v1
    TxLog.compact(spark, t)                                           // v2
    TxLog.deleteWhere(spark, t, "v", 3L, 3L)                          // v3 (CoW)
    assert(changes(t) == Set(
      ("a", 1L, 0L, "insert"), ("b", 2L, 0L, "insert"),
      ("c", 3L, 0L, "insert"), ("d", 4L, 0L, "insert"),
      ("b", 2L, 1L, "delete"), ("c", 3L, 3L, "delete")))
  }

  test("repeat MOR deletes deliver only the NEWLY masked positions each time") {
    val t = fresh("redelete")
    TxLog.append(spark, t, Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v"))
    TxLog.deleteWhereMorExpr(spark, t, "v >= 2")        // masks b, c
    TxLog.deleteWhereMorExpr(spark, t, "v >= 1")        // re-masks; only a is new
    assert(changes(t).filter(_._4 == "delete") ==
      Set(("b", 2L, 1L, "delete"), ("c", 3L, 1L, "delete"), ("a", 1L, 2L, "delete")))
  }

  test("overwrite delivers a full multiset diff (duplicates counted)") {
    val t = fresh("ow")
    TxLog.append(spark, t, Seq(("a", 1L), ("a", 1L), ("b", 2L)).toDF("k", "v"))
    TxLog.overwrite(spark, t, Seq(("a", 1L), ("c", 9L)).toDF("k", "v"))
    val rows = TxLog.readChangesCdf(spark, t, 0L, 1L).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(r.fieldIndex("_change_type")))).toSeq
    // one of the two (a,1) copies died, (b,2) died, (c,9) arrived
    assert(rows.sorted == Seq(("a", 1L, "delete"), ("b", 2L, "delete"),
      ("c", 9L, "insert")).sorted)
  }

  test("the feed aligns slices across a RENAME: every image reads under the range-end names") {
    val t = fresh("rename")
    TxLog.append(spark, t, Seq(("a", 1L), ("b", 2L)).toDF("k", "v")) // v0
    TxLog.renameColumn(spark, t, "v", "val")                          // v1 (schema-only)
    TxLog.append(spark, t, Seq(("c", 3L)).toDF("k", "val"))           // v2
    TxLog.deleteWhereMorExpr(spark, t, "val = 1")                     // v3: pre-rename file
    val cdf = TxLog.readChangesCdf(spark, t, -1L, TxLog.latestVersion(spark, t))
    assert(cdf.columns.take(2).toSeq == Seq("k", "val"),
      "all slices must surface under the range-end logical names")
    val rows = cdf.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(r.fieldIndex("_commit_version")),
      r.getString(r.fieldIndex("_change_type")))).toSet
    assert(rows == Set(
      ("a", 1L, 0L, "insert"), ("b", 2L, 0L, "insert"),
      ("c", 3L, 2L, "insert"),
      ("a", 1L, 3L, "delete")), // the delete image decodes the OLD file's physical
      s"unexpected feed: $rows")
  }

  test("mergeMor: one commit, zero rewrites, matched keys superseded, new keys inserted") {
    val t = fresh("merge")
    TxLog.append(spark, t, Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
    val before = TxLog.snapshotFiles(spark, t).toSet
    val v = TxLog.mergeMor(spark, t,
      Seq(("b", 20L), ("c", 30L)).toDF("k", "v"), Seq("k"))
    assert(before.subsetOf(TxLog.snapshotFiles(spark, t).toSet))
    assert(!TxLog.commitRemoves(spark, t, v))
    assert(TxLog.commitKind(spark, t, v).contains("merge"))
    assert(TxLog.read(spark, t).collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == Set(("a", 1L), ("b", 20L), ("c", 30L)))
    // the feed delivers the merge as delete(old image) + insert(new images)
    assert(changes(t).filter(_._3 == 1L) == Set(
      ("b", 2L, 1L, "delete"), ("b", 20L, 1L, "insert"), ("c", 30L, 1L, "insert")))
  }

  test("mergeMor: a pure-insert batch still lands tagged, and duplicate keys fail loudly") {
    val t = fresh("mergeins")
    TxLog.append(spark, t, Seq(("a", 1L)).toDF("k", "v"))
    val v = TxLog.mergeMor(spark, t, Seq(("z", 9L)).toDF("k", "v"), Seq("k"))
    assert(TxLog.commitKind(spark, t, v).contains("merge"))
    assert(TxLog.read(spark, t).count() == 2)
    val e = intercept[IllegalArgumentException] {
      TxLog.mergeMor(spark, t, Seq(("x", 1L), ("x", 2L)).toDF("k", "v"), Seq("k"))
    }
    assert(e.getMessage.contains("more than once"))
  }

  test("join MV folds a FACT MOR delete signed (dim unchanged); dim changes still recompute") {
    val base = java.nio.file.Files.createTempDirectory("graft-cdf-mvj").toString
    val (fact, dim, mv) = (s"$base/fact", s"$base/dim", s"$base/mvj")
    TxLog.append(spark, dim, Seq((1L, 10L), (2L, 20L)).toDF("ck", "nk"))
    TxLog.append(spark, fact,
      Seq((1L, 100L), (1L, 300L), (2L, 200L)).toDF("ck", "v"))
    def go() = MatView.refreshJoin(spark, fact, dim, mv,
      joinKeys = Seq("ck"), keyCols = Seq("nk"), valCol = "v")
    def view: Map[Long, (Long, Long, Long, Long)] =
      TxLog.read(spark, mv).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
    assert(go() == "build")
    // fact MOR delete removes nk=10's MAX (v=300): fold + targeted repair
    TxLog.deleteWhereMorExpr(spark, fact, "v = 300")
    assert(go() == "incremental-delete",
      "a fact delete must fold signed, not recompute")
    assert(view == Map(10L -> ((1L, 100L, 100L, 100L)),
      20L -> ((1L, 200L, 200L, 200L))))
    // fact MOR merge folds too
    TxLog.mergeMor(spark, fact, Seq((2L, 250L)).toDF("ck", "v"), Seq("ck"))
    assert(go() == "incremental-delete")
    assert(view(20L) == ((1L, 250L, 250L, 250L)))
    // a dim change still honestly recomputes
    TxLog.append(spark, dim, Seq((3L, 30L)).toDF("ck", "nk"))
    TxLog.append(spark, fact, Seq((3L, 50L)).toDF("ck", "v"))
    assert(go() == "recompute")
    assert(view(30L) == ((1L, 50L, 50L, 50L)))
  }

  test("MatView folds a delete signed; a delete that ties the min triggers the targeted repair") {
    val src = fresh("mvdel"); val mv = fresh("mvdelv")
    TxLog.append(spark, src,
      Seq(("g", 1L), ("g", 5L), ("g", 9L), ("h", 2L)).toDF("k", "v"))
    assert(MatView.refresh(spark, src, mv, Seq("k"), "v") == "build")
    // delete g's MINIMUM (v=1): cnt/total fold, min must be REPAIRED to 5
    TxLog.deleteWhereMorExpr(spark, src, "v = 1")
    assert(MatView.refresh(spark, src, mv, Seq("k"), "v") == "incremental-delete")
    val g = TxLog.read(spark, mv).filter(col("k") === "g").head()
    assert((g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4)) == ((2L, 14L, 5L, 9L)))
    // delete ALL of h: the group must leave the view
    TxLog.deleteWhereMorExpr(spark, src, "k = 'h'")
    assert(MatView.refresh(spark, src, mv, Seq("k"), "v") == "incremental-delete")
    assert(TxLog.read(spark, mv).filter(col("k") === "h").isEmpty)
    // and an overwrite still honestly recomputes
    TxLog.overwrite(spark, src, Seq(("z", 7L)).toDF("k", "v"))
    assert(MatView.refresh(spark, src, mv, Seq("k"), "v") == "recompute")
    assert(TxLog.read(spark, mv).collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == Set(("z", 1L)))
  }

  test("repeated merges of one key chain through dead copies; duplicate-keyed targets fail loudly") {
    val t = fresh("remerge")
    TxLog.append(spark, t, Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
    // merging the same key twice: the second merge sees ONE live row
    // (the first merge's superseded copy is dead) and must succeed
    TxLog.mergeMor(spark, t, Seq(("a", 10L)).toDF("k", "v"), Seq("k"))
    TxLog.mergeMor(spark, t, Seq(("a", 20L)).toDF("k", "v"), Seq("k"))
    assert(TxLog.read(spark, t).orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 20L), ("b", 2L)))
    // a genuinely duplicate-keyed target: the keyed merge would collapse
    // the two live copies into one image — it must refuse loudly
    val dup = fresh("dupmerge")
    TxLog.append(spark, dup, Seq(("x", 1L), ("x", 2L)).toDF("k", "v"))
    val e = intercept[IllegalArgumentException] {
      TxLog.mergeMor(spark, dup, Seq(("x", 9L)).toDF("k", "v"), Seq("k"))
    }
    assert(e.getMessage.contains("duplicate-keyed"))
    assert(TxLog.read(spark, dup).count() == 2, "the refused merge must not land")
  }

  test("SQL UPDATE/MERGE-DELETE flow through the change feed and fold into a MatView") {
    val src = fresh("sqlmv"); val mv = fresh("sqlmvv")
    TxLog.append(spark, src,
      Seq(("g", 1L), ("g", 5L), ("h", 2L), ("h", 8L)).toDF("k", "v"))
    assert(MatView.refresh(spark, src, mv, Seq("k"), "v") == "build")
    // a SQL UPDATE is one merge commit: the feed must deliver the old
    // image as delete and the reassigned image as insert, same version
    val v0 = TxLog.latestVersion(spark, src)
    spark.sql(s"UPDATE graft.`$src` SET v = v + 100 WHERE v >= 5")
    val changes = TxLog.readChangesCdf(spark, src, v0, v0 + 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(changes == Set(("g", 5L, "delete"), ("g", 105L, "insert"),
      ("h", 8L, "delete"), ("h", 108L, "insert")),
      s"unexpected UPDATE change images: $changes")
    // and the MatView folds it signed, never recomputing
    assert(MatView.refresh(spark, src, mv, Seq("k"), "v") == "incremental-delete")
    val g = TxLog.read(spark, mv).filter(col("k") === "g").head()
    assert((g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4)) ==
      ((2L, 106L, 1L, 105L)))
    // a SQL MERGE-DELETE erases by key and folds the same way
    Seq("h").toDF("k").createOrReplaceTempView("cdf_sql_del")
    spark.sql(s"MERGE INTO graft.`$src` t USING cdf_sql_del s " +
      "ON t.k = s.k WHEN MATCHED THEN DELETE")
    assert(MatView.refresh(spark, src, mv, Seq("k"), "v") == "incremental-delete")
    assert(TxLog.read(spark, mv).collect().map(_.getString(0)).toSeq == Seq("g"),
      "the erased key must leave the view, the other must survive")
  }
}
