package graft

import org.apache.spark.sql.functions._
import graft.sources.TxLog

/** The TxLog SQL catalog ([[graft.sources.TxLogCatalog]]), pinned:
  * pure-SQL reads ≡ library reads at every version, VERSION AS OF /
  * TIMESTAMP AS OF resolution, predicates/joins/aggregates over the
  * catalog table, and the loud read-only contract. */
class TxLogCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(n: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-cat-$n").toString + "/t"

  test("SQL reads equal library reads at latest and at every pinned version") {
    val t = fresh("parity")
    TxLog.append(spark, t, Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
    TxLog.append(spark, t, Seq(("c", 3L)).toDF("k", "v"))
    TxLog.deleteWhereMorExpr(spark, t, "k = 'a'")
    (0L to TxLog.latestVersion(spark, t)).foreach { v =>
      val sql = spark.sql(s"SELECT k, v FROM graft.`$t` VERSION AS OF $v")
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      val lib = TxLog.read(spark, t, Some(v))
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(sql == lib, s"SQL and library diverge at version $v")
    }
    assert(spark.sql(s"SELECT k, v FROM graft.`$t`")
      .collect().map(_.getString(0)).sorted.toSeq == Seq("b", "c"),
      "latest SQL read must see the MOR delete applied")
  }

  test("TIMESTAMP AS OF resolves through the commit-time mapping; SQL composes (filter/join/agg)") {
    val t = fresh("compose")
    TxLog.append(spark, t, Seq(("a", 1L), ("a", 5L), ("b", 2L)).toDF("k", "v"))
    val now = java.time.Instant.now().toString
    assert(spark.sql(
      s"SELECT COUNT(*) FROM graft.`$t` TIMESTAMP AS OF '$now'")
      .head().getLong(0) == 3L)
    val agg = spark.sql(
      s"SELECT k, SUM(v) AS s FROM graft.`$t` WHERE v < 5 GROUP BY k ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(agg == Seq(("a", 1L), ("b", 2L)))
    val joined = spark.sql(
      s"SELECT x.k, x.v + y.v AS s FROM graft.`$t` x JOIN graft.`$t` y " +
        "ON x.k = y.k WHERE x.v = 1 AND y.v = 5").head()
    assert((joined.getString(0), joined.getLong(1)) == (("a", 6L)))
  }

  test("the catalog is read-only and loud; a missing table errors at analysis") {
    val t = fresh("ro")
    TxLog.append(spark, t, Seq(("a", 1L)).toDF("k", "v"))
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$t` VALUES ('z', 9)")
    }
    assert(e.getMessage.contains("read-only") ||
      e.getMessage.toLowerCase.contains("does not support"),
      s"unexpected write error: ${e.getMessage}")
    val missing = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`/definitely/not/a/table`").collect()
    }
    assert(missing.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      missing.getMessage.toLowerCase.contains("not found"),
      s"unexpected missing-table error: ${missing.getMessage}")
  }
}
