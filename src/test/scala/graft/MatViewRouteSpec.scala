package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.MatView
import graft.plans.RouteToMatView
import graft.sources.TxLog

/** Transparent MV routing ([[graft.plans.RouteToMatView]]): a matching
  * fresh aggregate over the SOURCE serves from the view's state —
  * proven by the optimized plan (no source relation survives) AND by
  * value equality with the direct computation. Staleness, shape
  * mismatches, type drift, and an unset conf all fall back to the
  * source, loudly-correct by construction. */
class MatViewRouteSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** TxLog table paths of every catalog relation left in the optimized
    * plan — a ROUTED query has none (the view reads through the
    * library's file scan, not the catalog). */
  private def catalogScans(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table.name()
      case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        s.relation.table.name()
    }

  private def fixture(prefix: String): (String, String) = {
    val base = freshDir(prefix)
    val src = s"$base/src"; val mv = s"$base/mv"
    val rows = (1L to 300L)
      .map(i => (if (i % 3 == 0) "de" else "en", i % 5, i))
      .toDF("lang", "band", "v")
    TxLog.append(spark, src, rows)
    MatView.refresh(spark, src, mv, Seq("lang", "band"), "v")
    (src, mv)
  }

  private def withRoute[T](mv: String)(body: => T): T = {
    spark.conf.set(RouteToMatView.ConfKey, mv)
    RouteToMatView.invalidateCache()
    try body
    finally {
      spark.conf.unset(RouteToMatView.ConfKey)
      RouteToMatView.invalidateCache()
    }
  }

  test("an exact-shape aggregate routes to the view and matches the source") {
    val (src, mv) = fixture("mvroute-exact")
    val sql = s"SELECT lang, band, COUNT(*) AS cnt, SUM(v) AS total, " +
      s"MIN(v) AS vmin, MAX(v) AS vmax, AVG(v) AS vavg " +
      s"FROM graft.`$src` GROUP BY lang, band"
    val truth = spark.sql(sql).collect().toSet // conf unset: source scan
    withRoute(mv) {
      val routed = spark.sql(sql)
      assert(catalogScans(routed).isEmpty,
        s"routed plan still scans the catalog: ${catalogScans(routed)}")
      assert(routed.collect().toSet == truth)
    }
  }

  test("a fact-join-dim aggregate routes to the JOIN view; filters/staleness fall back") {
    val base = freshDir("mvroute-join")
    val (fact, dim, mv) = (s"$base/fact", s"$base/dim", s"$base/mv")
    TxLog.append(spark, dim,
      (1L to 20L).map(i => (i, i % 4)).toDF("ck", "nation"))
    TxLog.append(spark, fact,
      (1L to 300L).map(i => (i, i % 25 + 1, i)).toDF("ok", "ck", "v"))
    MatView.refreshJoin(spark, fact, dim, mv,
      joinKeys = Seq("ck"), keyCols = Seq("nation"), valCol = "v")
    val sql = s"SELECT nation, COUNT(*) AS cnt, SUM(v) AS total, " +
      s"MIN(v) AS vmin, MAX(v) AS vmax " +
      s"FROM graft.`$fact` f JOIN graft.`$dim` d ON f.ck = d.ck " +
      "GROUP BY nation"
    val truth = spark.sql(sql).collect().toSet
    val keyFilteredSql = s"SELECT nation, COUNT(*) AS cnt, SUM(v) AS total " +
      s"FROM graft.`$fact` f JOIN graft.`$dim` d ON f.ck = d.ck " +
      "WHERE nation IN (1, 2) GROUP BY nation"
    val kfTruth = spark.sql(keyFilteredSql).collect().toSet // conf unset
    assert(kfTruth.nonEmpty)
    withRoute(mv) {
      val routed = spark.sql(sql)
      assert(catalogScans(routed).isEmpty,
        s"join aggregate must route: ${catalogScans(routed)}")
      assert(routed.collect().toSet == truth)
      // dim-first orientation routes too (inner is symmetric)
      val flipped = spark.sql(s"SELECT nation, COUNT(*) AS cnt " +
        s"FROM graft.`$dim` d JOIN graft.`$fact` f ON f.ck = d.ck " +
        "GROUP BY nation")
      assert(catalogScans(flipped).isEmpty, "flipped inner must route")
      // a KEY-only WHERE routes (it filters whole groups, wherever the
      // optimizer pushed it) and stays value-exact vs the unrouted truth
      val kfRouted = spark.sql(keyFilteredSql)
      assert(catalogScans(kfRouted).isEmpty,
        "a grouping-key WHERE must route on the join shape")
      assert(kfRouted.collect().toSet == kfTruth)
      // a non-key WHERE refuses (join filters filter rows, not groups)
      val filtered = spark.sql(s"SELECT nation, COUNT(*) AS cnt " +
        s"FROM graft.`$fact` f JOIN graft.`$dim` d ON f.ck = d.ck " +
        "WHERE v > 100 GROUP BY nation")
      assert(catalogScans(filtered).nonEmpty,
        "a non-key-filtered join aggregate must read the sources")
      // a different ON refuses (other key semantics)
      val otherOn = spark.sql(s"SELECT nation, COUNT(*) AS cnt " +
        s"FROM graft.`$fact` f JOIN graft.`$dim` d ON f.v = d.ck " +
        "GROUP BY nation")
      assert(catalogScans(otherOn).nonEmpty,
        "an ON outside the view's keys must read the sources")
    }
    // a fact commit makes the view stale: the SAME query reads sources
    TxLog.append(spark, fact, Seq((1000L, 1L, 999L)).toDF("ok", "ck", "v"))
    withRoute(mv) {
      val stale = spark.sql(sql)
      assert(catalogScans(stale).nonEmpty,
        "a stale join view must never serve")
      // refresh restores routing (and the new row shows up)
      MatView.refreshJoin(spark, fact, dim, mv,
        joinKeys = Seq("ck"), keyCols = Seq("nation"), valCol = "v")
      RouteToMatView.invalidateCache()
      val again = spark.sql(sql)
      assert(catalogScans(again).isEmpty, "refreshed join view must route")
      assert(again.filter(col("nation") === 1L)
        .head().getAs[Long]("vmax") == 999L,
        "the routed state must reflect the refreshed fact")
    }
  }

  test("a key-subset rollup re-aggregates the state's monoids") {
    val (src, mv) = fixture("mvroute-rollup")
    val sql = s"SELECT lang, COUNT(*) AS cnt, SUM(v) AS total, " +
      s"MIN(v) AS vmin, MAX(v) AS vmax " +
      s"FROM graft.`$src` GROUP BY lang"
    val truth = spark.sql(sql).collect().toSet
    withRoute(mv) {
      val routed = spark.sql(sql)
      assert(catalogScans(routed).isEmpty, "rollup must route")
      assert(routed.collect().toSet == truth)
    }
  }

  test("HAVING above the routed aggregate resolves untouched") {
    val (src, mv) = fixture("mvroute-having")
    val sql = s"SELECT lang, band, COUNT(*) AS cnt FROM graft.`$src` " +
      s"GROUP BY lang, band HAVING COUNT(*) > 30 ORDER BY lang, band"
    val truth = spark.sql(sql).collect().toSeq
    withRoute(mv) {
      val routed = spark.sql(sql)
      assert(catalogScans(routed).isEmpty)
      assert(routed.collect().toSeq == truth)
    }
  }

  test("a stale view never serves; a refresh restores routing") {
    val (src, mv) = fixture("mvroute-stale")
    val sql = s"SELECT lang, band, COUNT(*) AS cnt FROM graft.`$src` " +
      s"GROUP BY lang, band"
    withRoute(mv) {
      assert(catalogScans(spark.sql(sql)).isEmpty, "fresh: must route")
      TxLog.append(spark, src, Seq(("fr", 9L, 1L)).toDF("lang", "band", "v"))
      RouteToMatView.invalidateCache()
      val stale = spark.sql(sql)
      assert(catalogScans(stale).nonEmpty,
        "one source commit later the query must read the source again")
      assert(stale.filter(col("lang") === "fr").count() == 1L,
        "the fallback must see the new rows the view has not folded")
      MatView.refreshNamed(spark, mv)
      RouteToMatView.invalidateCache()
      val again = spark.sql(sql)
      assert(catalogScans(again).isEmpty, "refreshed: routing restored")
      assert(again.filter(col("lang") === "fr").count() == 1L)
    }
  }

  test("key-only WHERE predicates filter groups on the state") {
    val (src, mv) = fixture("mvroute-where")
    val sql = s"SELECT lang, band, COUNT(*) AS cnt, SUM(v) AS total " +
      s"FROM graft.`$src` WHERE lang = 'de' AND band < 3 " +
      s"GROUP BY lang, band"
    val truth = spark.sql(sql).collect().toSet
    withRoute(mv) {
      val routed = spark.sql(sql)
      assert(catalogScans(routed).isEmpty, "key-only WHERE must route")
      assert(routed.collect().toSet == truth)
      // ...and composes with the rollup
      val roll = s"SELECT band, COUNT(*) AS cnt FROM graft.`$src` " +
        s"WHERE lang = 'de' GROUP BY band"
      val rollTruth =
        spark.conf.unset(graft.plans.RouteToMatView.ConfKey) match {
          case _ =>
            try spark.sql(roll).collect().toSet
            finally spark.conf.set(graft.plans.RouteToMatView.ConfKey, mv)
        }
      RouteToMatView.invalidateCache()
      val rolled = spark.sql(roll)
      assert(catalogScans(rolled).isEmpty, "filtered rollup must route")
      assert(rolled.collect().toSet == rollTruth)
    }
  }

  test("non-matching shapes read the source: filter, distinct, wrong column") {
    val (src, mv) = fixture("mvroute-shape")
    withRoute(mv) {
      val shapes = Seq(
        s"SELECT lang, band, COUNT(*) AS cnt FROM graft.`$src` " +
          "WHERE v > 10 GROUP BY lang, band", // filtered scan
        s"SELECT lang, band, COUNT(DISTINCT v) AS d FROM graft.`$src` " +
          "GROUP BY lang, band", // distinct aggregate
        s"SELECT lang, band, SUM(band) AS s FROM graft.`$src` " +
          "GROUP BY lang, band", // not the maintained value column
        s"SELECT lang, band, SUM(v + 1) AS s FROM graft.`$src` " +
          "GROUP BY lang, band") // expression over the input
      shapes.foreach { q =>
        assert(catalogScans(spark.sql(q)).nonEmpty,
          s"must NOT route: $q")
      }
    }
  }

  test("continuous maintenance keeps routing live across source commits") {
    val (src, mv) = fixture("mvroute-live")
    val ckpt = freshDir("mvroute-live-ckpt")
    val queries = graft.streaming.StreamingMatView
      .maintainNamed(spark, mv, ckpt)
    try withRoute(mv) {
      val sql = s"SELECT lang, band, COUNT(*) AS cnt FROM graft.`$src` " +
        s"GROUP BY lang, band"
      assert(catalogScans(spark.sql(sql)).isEmpty)
      TxLog.append(spark, src, Seq(("fr", 9L, 1L)).toDF("lang", "band", "v"))
      queries.foreach(_.processAllAvailable()) // the maintainer folds it
      RouteToMatView.invalidateCache()
      val after = spark.sql(sql)
      assert(catalogScans(after).isEmpty,
        "the maintained view must stay fresh — no fallback to the source")
      assert(after.filter(col("lang") === "fr").head().getLong(2) == 1L,
        "the routed answer must include the just-folded commit")
    } finally queries.foreach(_.stop())
  }

  test("without the conf no query routes") {
    val (src, _) = fixture("mvroute-off")
    val q = spark.sql(s"SELECT lang, band, COUNT(*) AS cnt " +
      s"FROM graft.`$src` GROUP BY lang, band")
    assert(catalogScans(q).nonEmpty)
  }
}
