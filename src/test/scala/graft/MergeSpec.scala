package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def base3 = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "s", "v")

  test("mergeUpsert: update, delete, insert, untouched — all four fates in one batch") {
    val updates = Seq(
      (2L, "B", 200.0, false), // matched -> replace
      (3L, "c", 30.0, true),   // matched + delete -> gone
      (9L, "i", 90.0, false),  // unmatched -> insert
      (8L, "x", 0.0, true))    // unmatched + delete -> no-op
      .toDF("k", "s", "v", "_del")
    val got = Merge.mergeUpsert(base3, updates, Seq("k"), Some("_del"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", 10.0), (2L, "B", 200.0), (4L, "d", 40.0),
      (9L, "i", 90.0)))
  }

  test("mergeUpsert without a delete column is pure upsert") {
    val updates = Seq((1L, "A", 11.0), (5L, "e", 50.0)).toDF("k", "s", "v")
    val got = Merge.mergeUpsert(base3, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "A", 11.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0), (5L, "e", 50.0)))
  }

  test("mergeUpsert: duplicate batch keys fail LOUDLY, even when both rows are deletes") {
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val dup = Seq((2L, "x", 1.0, false), (2L, "y", 2.0, false))
      .toDF("k", "s", "v", "_del")
    val e = intercept[Throwable] {
      Merge.mergeUpsert(base3, dup, Seq("k"), Some("_del")).collect()
    }
    assert(msgs(e).contains("name each key once"), msgs(e))
    // delete rows are filtered before the union — the guard must still
    // see them on the anti-join branch
    val dupDel = Seq((2L, "x", 1.0, true), (2L, "y", 2.0, true))
      .toDF("k", "s", "v", "_del")
    val e2 = intercept[Throwable] {
      Merge.mergeUpsert(base3, dupDel, Seq("k"), Some("_del")).collect()
    }
    assert(msgs(e2).contains("name each key once"), msgs(e2))
  }

  test("mergeUpsert: updates missing a base column are rejected up front") {
    val bad = Seq((1L, "A")).toDF("k", "s")
    val e = intercept[IllegalArgumentException] {
      Merge.mergeUpsert(base3, bad, Seq("k"))
    }
    assert(e.getMessage.contains("lack base columns"))
  }

  test("mergeIntoPartitioned rewrites ONLY touched partitions (file-level proof)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-merge").toString
    Seq((1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0), (4L, "p3", 40.0))
      .toDF("k", "p", "v")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    def files(part: String): Map[String, Long] = {
      val d = new java.io.File(s"$dir/p=$part")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val p2Before = files("p2")
    val p3Before = files("p3")
    val updates = Seq(
      (2L, "p1", 200.0, false),  // update inside p1
      (5L, "p4", 50.0, false),   // insert opening a NEW partition
      (1L, "p1", 10.0, true))    // delete inside p1
      .toDF("k", "p", "v", "_del")
    val touched = Merge.mergeIntoPartitioned(spark, dir, updates,
      Seq("k"), "p", Some("_del"))
    assert(touched == Seq("p1", "p4"))
    // untouched partitions: exactly the same files, byte-for-byte mtimes
    assert(files("p2") == p2Before && files("p3") == p3Before,
      "untouched partitions were rewritten")
    val got = spark.read.parquet(dir)
      .select("k", "p", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((2L, "p1", 200.0), (3L, "p2", 30.0),
      (4L, "p3", 40.0), (5L, "p4", 50.0)))
  }

  test("mergeIntoPartitioned: a fully-deleted partition keeps stale files — the documented edge") {
    val dir = java.nio.file.Files.createTempDirectory("graft-merge-del").toString
    Seq((1L, "p1", 10.0), (2L, "p2", 20.0)).toDF("k", "p", "v")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val updates = Seq((2L, "p2", 20.0, true)).toDF("k", "p", "v", "_del")
    val touched = Merge.mergeIntoPartitioned(spark, dir, updates,
      Seq("k"), "p", Some("_del"))
    // the writer produced zero rows for p2, so dynamic overwrite never
    // claimed it: the stale row SURVIVES. The touched list is the
    // caller's reconciliation handle — p2 is named there.
    assert(touched == Seq("p2"))
    val got = spark.read.parquet(dir).select("k").as[Long].collect().toSet
    assert(got == Set(1L, 2L),
      s"dynamic-overwrite delete semantics changed — update the Merge scaladoc: $got")
  }

  test("qw_merge_upsert plans the anti-join as a broadcast, never shuffling the base") {
    val plan = Merge.qwMergeUpsert(spark, sfTiny).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast anti-join for the change batch:\n$plan")
  }

  test("snapshotDiff: all three change classes, null-safe compare, unchanged rows dropped") {
    import spark.implicits._
    val old = Seq(
      (1L, Some(10.0)), // unchanged — must NOT appear
      (2L, Some(20.0)), // value change
      (3L, Some(30.0)), // removed
      (4L, None: Option[Double]), // null -> value: a change, not a miss
      (5L, None: Option[Double])) // null -> null: unchanged
      .toDF("k", "v")
    val neu = Seq(
      (1L, Some(10.0)),
      (2L, Some(21.0)),
      (4L, Some(40.0)),
      (5L, None: Option[Double]),
      (6L, Some(60.0))) // added
      .toDF("k", "v")
    val got = Merge.snapshotDiff(old, neu, Seq("k"), Seq("v")).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got == Map(
      2L -> ("changed", Some(20.0), Some(21.0)),
      3L -> ("removed", Some(30.0), None),
      4L -> ("changed", None, Some(40.0)),
      6L -> ("added", None, Some(60.0))), got.toString)
  }

  test("snapshotDiff ∘ mergeUpsert round-trips: applying the diff to old reproduces new") {
    import spark.implicits._
    // pseudo-random keyed snapshots with every fate represented
    val rng = new scala.util.Random(11)
    val old = (1L to 60L).map(k => (k, rng.nextInt(1000).toDouble)).toDF("k", "v")
    val neu = (1L to 80L).flatMap { k =>
      if (k % 7 == 0) None // removed (and 61..80 % 7 == 0 never existed)
      else if (k <= 60 && k % 5 == 0) Some((k, -1.0)) // changed
      else if (k <= 60) Some((k, 0.0)) // overwritten below by old values
      else Some((k, k * 10.0)) // added
    }.toDF("k", "v")
      // unchanged rows must be byte-identical to old: patch them in
      .join(old.withColumnRenamed("v", "v_old"), Seq("k"), "left")
      .select(col("k"), when(col("v") === 0.0, col("v_old"))
        .otherwise(col("v")).as("v"))
    val diff = Merge.snapshotDiff(old, neu, Seq("k"), Seq("v"))
    // diff → MERGE batch: added/changed upsert the new value, removed deletes
    val batch = diff.select(col("k"),
      coalesce(col("new_v"), lit(0.0)).as("v"),
      (col("change") === "removed").as("_delete"))
    val merged = Merge.mergeUpsert(old, batch, Seq("k"), Some("_delete"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val want = neu.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(merged == want,
      s"round-trip mismatch: extra=${merged -- want} missing=${want -- merged}")
  }

  test("qwSnapshotDiff recovers exactly the planted change classes") {
    val rows = Merge.qwSnapshotDiff(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, change) =>
      val expected =
        if (k >= 100000000L) "added"
        else if (k % 101 == 3) "removed"
        else if (k % 101 == 5) "changed"
        else fail(s"unplanted key $k surfaced as $change")
      assert(change == expected, s"key $k: $change vs $expected")
    }
    assert(rows.map(_._2).toSet == Set("added", "removed", "changed"),
      "all three classes must be planted at this SF")
  }
}
