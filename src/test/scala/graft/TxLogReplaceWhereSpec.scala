package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.sources.TxLog

/** REPLACE WHERE ([[graft.sources.TxLog.replaceWhere]]): the atomic
  * slice backfill. Pinned: exact slice semantics (matching rows out,
  * images in, everything else untouched — zero files rewritten),
  * outside-slice loudness (NULL counts as outside), write-boundary
  * features (constraints gate, identity mints fresh), the empty-slice
  * pure-insert edge, and the SQL surface. */
class TxLogReplaceWhereSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def freshTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("replaces exactly the slice, merge-on-read, in one commit") {
    val t = freshTable("txrw-basic")
    val rows = (1L to 90L).map(i => (i, if (i % 3 == 0) "de" else "en", i))
      .toDF("k", "lang", "v")
    TxLog.append(spark, t, rows)
    val before = TxLog.snapshotFiles(spark, t).toSet
    val backfill = (1L to 90L).filter(_ % 3 == 0)
      .map(i => (i, "de", i + 1000L)).toDF("k", "lang", "v")
    val v = TxLog.replaceWhere(spark, t, backfill, "lang = 'de'")
    assert(TxLog.snapshotFiles(spark, t).toSet.intersect(before) == before,
      "replaceWhere must rewrite zero prior files")
    assert(TxLog.commitKind(spark, t, v).contains("merge"))
    assert(TxLog.dvAt(spark, t).nonEmpty, "the slice must be masked, not rewritten")
    val got = TxLog.read(spark, t).as[(Long, String, Long)].collect()
    assert(got.length == 90)
    got.foreach { case (k, lang, vv) =>
      if (k % 3 == 0) assert(lang == "de" && vv == k + 1000L, s"row $k")
      else assert(lang == "en" && vv == k, s"untouched row $k changed")
    }
  }

  test("a batch spilling outside its slice fails loudly (NULL = outside)") {
    val t = freshTable("txrw-outside")
    TxLog.append(spark, t,
      Seq((1L, "de", 1L), (2L, "en", 2L)).toDF("k", "lang", "v"))
    val spilling = Seq((1L, "de", 10L), (2L, "en", 20L)).toDF("k", "lang", "v")
    val e = intercept[IllegalArgumentException] {
      TxLog.replaceWhere(spark, t, spilling, "lang = 'de'")
    }
    assert(e.getMessage.contains("OUTSIDE the REPLACE WHERE"))
    val nullLang = Seq((3L, None: Option[String], 3L)).toDF("k", "lang", "v")
    val e2 = intercept[IllegalArgumentException] {
      TxLog.replaceWhere(spark, t, nullLang, "lang = 'de'")
    }
    assert(e2.getMessage.contains("OUTSIDE"),
      "a NULL-predicate image is outside the slice (it would never be re-replaced)")
    assert(TxLog.read(spark, t).count() == 2, "a failed backfill must land nothing")
  }

  test("an empty slice is a pure insert (the first backfill of a new day)") {
    val t = freshTable("txrw-empty")
    TxLog.append(spark, t, Seq((1L, "en", 1L)).toDF("k", "lang", "v"))
    TxLog.replaceWhere(spark, t,
      Seq((9L, "fr", 9L)).toDF("k", "lang", "v"), "lang = 'fr'")
    assert(TxLog.read(spark, t).count() == 2)
    assert(TxLog.dvAt(spark, t).isEmpty, "nothing matched: no mask bound")
  }

  test("constraints gate the images; identity mints fresh ids") {
    val t = freshTable("txrw-boundary")
    TxLog.createTable(spark, t, StructType(Seq(
      StructField("k", LongType), StructField("lang", StringType))))
    TxLog.addCheckConstraint(spark, t, "k_pos", "k > 0")
    TxLog.addIdentityColumn(spark, t, "row_id")
    TxLog.append(spark, t, Seq((1L, "de"), (2L, "en")).toDF("k", "lang"))
    val bad = Seq((-9L, "de")).toDF("k", "lang")
    val e = intercept[IllegalArgumentException] {
      TxLog.replaceWhere(spark, t, bad, "lang = 'de'")
    }
    assert(e.getMessage.contains("k_pos"))
    TxLog.replaceWhere(spark, t, Seq((10L, "de")).toDF("k", "lang"),
      "lang = 'de'")
    val imageId = TxLog.read(spark, t).filter(col("lang") === "de")
      .select("row_id").as[Long].head()
    assert(imageId == 3L,
      s"the image must mint past the high-water (got $imageId)")
    val keptId = TxLog.read(spark, t).filter(col("lang") === "en")
      .select("row_id").as[Long].head()
    assert(Set(1L, 2L).contains(keptId),
      s"the untouched row must keep its original id (got $keptId)")
    val explicit = Seq((11L, "de", 99L)).toDF("k", "lang", "row_id")
    val e2 = intercept[IllegalArgumentException] {
      TxLog.replaceWhere(spark, t, explicit, "lang = 'de'")
    }
    assert(e2.getMessage.contains("GENERATED ALWAYS AS IDENTITY"))
  }

  test("SQL surface: INSERT INTO ... REPLACE WHERE ... SELECT") {
    val t = freshTable("txrw-sql")
    TxLog.append(spark, t,
      (1L to 30L).map(i => (i, if (i % 2 == 0) "de" else "en", i))
        .toDF("k", "lang", "v"))
    spark.sql(s"INSERT INTO graft.`$t` REPLACE WHERE lang = 'de' " +
      s"SELECT k, lang, v + 500 AS v FROM graft.`$t` WHERE lang = 'de'")
    val got = TxLog.read(spark, t).as[(Long, String, Long)].collect()
    assert(got.length == 30)
    got.foreach { case (k, lang, vv) =>
      if (k % 2 == 0) assert(vv == k + 500L, s"row $k")
      else assert(vv == k, s"untouched row $k changed")
    }
    // a plain INSERT INTO still delegates to Spark untouched
    val before = TxLog.read(spark, t).count()
    intercept[Exception] { // not a graft-catalog managed-table INSERT shape
      spark.sql("INSERT INTO no_such_table SELECT 1")
    }
    assert(TxLog.read(spark, t).count() == before)
  }
}
