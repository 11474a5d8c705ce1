package graft

import org.apache.spark.sql.functions._
import graft.sources.TxLog
import graft.streaming.StreamingMatView

/** Continuous MV maintenance: the view must trail the source's commits
  * exactly (fold-in ≡ recompute after every wave), and idle restarts
  * across the checkpoint must not create view versions. */
class StreamingMatViewSpec extends SparkSpec {
  import spark.implicits._

  test("source stream → TxLog commits → continuously-maintained view ≡ recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.nio.file.Files.createTempDirectory("graft-smv").toString
    val src = s"$base/src"; val mv = s"$base/view"
    def expected: Map[String, (Long, Long)] =
      TxLog.read(spark, src).groupBy("k")
        .agg(count(lit(1)).as("cnt"), sum("v").as("total")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def got: Map[String, (Long, Long)] =
      TxLog.read(spark, mv).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val ingest = MemoryStream[(String, Long)](spark)
    val qIngest = ingest.toDF().toDF("k", "v")
      .writeStream.option("checkpointLocation", s"$base/ckpt-ingest")
      .foreachBatch(TxLog.appendSink(src)).outputMode("append").start()
    def startMaintain() =
      StreamingMatView.maintain(spark, src, mv, Seq("k"), "v", s"$base/ckpt-mv")
    try {
      ingest.addData(("a", 1L), ("a", 2L), ("b", 3L))
      qIngest.processAllAvailable()
      val qMv = startMaintain()
      try {
        qMv.processAllAvailable()
        assert(got == expected, "view must equal a recompute after the first wave")
        // a second wave: the view advances incrementally
        ingest.addData(("a", 10L), ("c", 5L))
        qIngest.processAllAvailable()
        qMv.processAllAvailable()
        assert(got == expected, "view must trail the second wave exactly")
        assert(got == Map("a" -> ((3L, 13L)), "b" -> ((1L, 3L)), "c" -> ((1L, 5L))))
      } finally qMv.stop()
      // idle restart across the checkpoint: no new view versions
      val before = TxLog.versions(spark, mv)
      val qMv2 = startMaintain()
      try qMv2.processAllAvailable() finally qMv2.stop()
      assert(TxLog.versions(spark, mv) == before,
        "an idle restart must not create view versions")
      // a third wave against the RESTARTED stream keeps maintaining
      val qMv3 = startMaintain()
      try {
        ingest.addData(("b", 100L))
        qIngest.processAllAvailable()
        qMv3.processAllAvailable()
        assert(got == expected, "view must keep trailing after a restart")
        assert(got("b") == ((2L, 103L)))
        // a REWRITE commit (stats-free delete via overwrite) must not
        // kill the stream, and its own (empty) trigger batch must
        // refresh the view through the recompute fallback
        TxLog.overwrite(spark, src,
          TxLog.read(spark, src).filter($"k" =!= "a"))
        qMv3.processAllAvailable()
        assert(qMv3.isActive, "a rewrite commit must not kill the maintenance stream")
        assert(got == expected, "the rewrite's own trigger must recompute the view")
        assert(!got.contains("a"), "deleted keys must leave the view")
        // a MOR delete's (empty under skipChangeCommits) trigger batch
        // must fold the delete SIGNED through the r13 CDF path — the
        // view trails it exactly without a recompute-sized scan
        val viewVersionsBefore = TxLog.versions(spark, mv).size
        TxLog.deleteWhereMorExpr(spark, src, "k = 'c'")
        qMv3.processAllAvailable()
        assert(got == expected, "the MOR delete's trigger must fold the view")
        assert(!got.contains("c"), "MOR-deleted keys must leave the view")
        assert(TxLog.versions(spark, mv).size == viewVersionsBefore + 1,
          "exactly one view commit per folded delete")
      } finally qMv3.stop()
    } finally qIngest.stop()
  }

  test("join-MV maintenance: fact commits fold, a dim commit's trigger recomputes; uncoordinated twins stay exact") {
    import graft.operators.MatView
    val base = java.nio.file.Files.createTempDirectory("graft-smvj").toString
    val (fact, dim, mv) = (s"$base/fact", s"$base/dim", s"$base/view")
    def ck() = java.nio.file.Files.createTempDirectory("graft-smvj-ck").toString
    def viewMap: Map[Long, (Long, Long)] =
      TxLog.read(spark, mv).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def expected: Map[Long, (Long, Long)] =
      TxLog.read(spark, fact).join(TxLog.read(spark, dim), "k")
        .groupBy("g").agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("cnt"),
          org.apache.spark.sql.functions.sum("v").as("total"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // dim: key → group; fact: key → value
    TxLog.append(spark, dim, Seq((1L, 10L), (2L, 20L)).toDF("k", "g"))
    TxLog.append(spark, fact, Seq((1L, 5L), (2L, 7L), (3L, 9L)).toDF("k", "v"))
    val (qf, qd) = graft.streaming.StreamingMatView.maintainJoin(
      spark, fact, dim, mv, Seq("k"), Seq("g"), "v", None, ck(), ck())
    try {
      qf.processAllAvailable(); qd.processAllAvailable()
      assert(viewMap == expected, "initial build must land")
      assert(!viewMap.keySet.exists(_ == 30L), "unmatched fact keys stay out")
      // fact commit: the fact-side trigger folds it
      TxLog.append(spark, fact, Seq((1L, 100L)).toDF("k", "v"))
      qf.processAllAvailable(); qd.processAllAvailable()
      assert(viewMap == expected, "fact fold went stale")
      // dim commit completing key 3: only a RECOMPUTE can pick up the
      // fact rows the inner join previously dropped
      TxLog.append(spark, dim, Seq((3L, 30L)).toDF("k", "g"))
      qd.processAllAvailable(); qf.processAllAvailable()
      assert(viewMap == expected, "dim-side trigger must recompute")
      assert(viewMap.contains(30L), "previously-dropped fact rows must appear")
    } finally { qf.stop(); qd.stop() }
  }

  test("maintainNamed drives a SQL-created view from its persisted definition") {
    val base = java.nio.file.Files.createTempDirectory("graft-smvn").toString
    val src = s"$base/src"; val mv = s"$base/view"
    TxLog.append(spark, src, Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
    assert(spark.sql(s"CREATE MATERIALIZED VIEW graft.`$mv` AS " +
      s"SELECT k, COUNT(*) AS cnt, SUM(v) AS total, MIN(v) AS vmin, " +
      s"MAX(v) AS vmax FROM graft.`$src` GROUP BY k").head().getString(0)
      == "build")
    def got: Map[String, (Long, Long)] =
      TxLog.read(spark, mv).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val qs = graft.streaming.StreamingMatView.maintainNamed(
      spark, mv, s"$base/ckpt")
    try {
      assert(qs.length == 1, "a single-table view subscribes one source")
      TxLog.append(spark, src, Seq(("a", 10L), ("c", 5L)).toDF("k", "v"))
      qs.foreach(_.processAllAvailable())
      assert(got == Map("a" -> ((2L, 11L)), "b" -> ((1L, 2L)),
        "c" -> ((1L, 5L))), "the named maintainer must trail the commit")
      // a MOR delete folds signed through the named refresh
      TxLog.deleteWhereMorExpr(spark, src, "v = 2")
      qs.foreach(_.processAllAvailable())
      assert(got == Map("a" -> ((2L, 11L)), "c" -> ((1L, 5L))),
        "the erased group must leave the view")
    } finally qs.foreach(_.stop())
    // a join view subscribes BOTH sources
    val (fact2, dim2, mv2) = (s"$base/f2", s"$base/d2", s"$base/v2")
    TxLog.append(spark, dim2, Seq((1L, 100L)).toDF("k", "g"))
    TxLog.append(spark, fact2, Seq((1L, 7L)).toDF("k", "v"))
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$mv2` AS " +
      s"SELECT g, COUNT(*) AS cnt, SUM(v) AS total, MIN(v) AS vmin, " +
      s"MAX(v) AS vmax FROM graft.`$fact2` JOIN graft.`$dim2` USING (k) " +
      s"GROUP BY g")
    val qs2 = graft.streaming.StreamingMatView.maintainNamed(
      spark, mv2, s"$base/ckpt2")
    try {
      assert(qs2.length == 2, "a join view subscribes fact AND dim")
      TxLog.append(spark, fact2, Seq((1L, 3L)).toDF("k", "v"))
      qs2.foreach(_.processAllAvailable())
      assert(TxLog.read(spark, mv2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
        Seq((100L, 2L, 10L)), "the fact-side trigger must fold")
    } finally qs2.foreach(_.stop())
  }

  test("maintainNamed maintains a computed-key view from its persisted expression (r16)") {
    val base = java.nio.file.Files.createTempDirectory("graft-smve").toString
    val src = s"$base/src"; val mv = s"$base/view"
    TxLog.append(spark, src, Seq(("a", 15L), ("b", 27L)).toDF("k", "v"))
    assert(spark.sql(s"CREATE MATERIALIZED VIEW graft.`$mv` AS " +
      s"SELECT v div 10 AS bucket, COUNT(*) AS cnt, SUM(v) AS total, " +
      s"MIN(v) AS vmin, MAX(v) AS vmax FROM graft.`$src` GROUP BY bucket")
      .head().getString(0) == "build")
    val qs = graft.streaming.StreamingMatView.maintainNamed(
      spark, mv, s"$base/ckpt")
    try {
      TxLog.append(spark, src, Seq(("c", 12L), ("d", 33L)).toDF("k", "v"))
      qs.foreach(_.processAllAvailable())
      val got = TxLog.read(spark, mv).select("bucket", "cnt", "total")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == Map(1L -> ((2L, 27L)), 2L -> ((1L, 27L)), 3L -> ((1L, 33L))),
        "the continuous maintainer must derive the computed key on deltas")
    } finally qs.foreach(_.stop())
  }

  test("maintainNamed folds the approx-distinct flavor by sketch union") {
    val base = java.nio.file.Files.createTempDirectory("graft-smvd").toString
    val src = s"$base/src"; val mv = s"$base/view"
    TxLog.append(spark, src,
      Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("k", "s"))
    assert(spark.sql(s"CREATE MATERIALIZED VIEW graft.`$mv` AS " +
      s"SELECT k, COUNT(*) AS cnt, APPROX_COUNT_DISTINCT(s) AS ndv " +
      s"FROM graft.`$src` GROUP BY k").head().getString(0) == "build")
    def got: Map[String, (Long, Long)] =
      graft.operators.MatView.readDistinct(spark, mv, Seq("k")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val qs = graft.streaming.StreamingMatView.maintainNamed(
      spark, mv, s"$base/ckpt")
    try {
      assert(qs.length == 1)
      // append-only delta folds by sketch union: a's new DISTINCT value
      // registers, b's repeated one must not inflate the estimate
      TxLog.append(spark, src,
        Seq(("a", "z"), ("b", "x")).toDF("k", "s"))
      qs.foreach(_.processAllAvailable())
      assert(got == Map("a" -> ((3L, 3L)), "b" -> ((2L, 1L))),
        "the named maintainer must union-fold the distinct sketch")
      // a delete forces the honest recompute leg (sketches cannot unsee)
      TxLog.deleteWhereMorExpr(spark, src, "s = 'y'")
      qs.foreach(_.processAllAvailable())
      assert(got == Map("a" -> ((2L, 2L)), "b" -> ((2L, 1L))),
        "the delete must recompute the sketches from the live rows")
    } finally qs.foreach(_.stop())
  }
}
