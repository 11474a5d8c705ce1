package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.TxLog

/** Write-boundary CHECK constraints ([[graft.sources.TxLog]]): the
  * Delta-invariants contract — persisted in the metas channel, enforced
  * on every commit that lands NEW row images, never on row-invisible
  * rewrites, with SQL-standard NULL-passing semantics and loud
  * rejection of every malformed shape. */
class TxLogConstraintSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def freshTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("lifecycle: add validates existing data, gates appends, drop re-admits") {
    val t = freshTable("txck-life")
    TxLog.append(spark, t, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    val v1 = TxLog.addCheckConstraint(spark, t, "v-nonneg", "v >= 0")
    assert(TxLog.checkConstraints(spark, t) == Map("v-nonneg" -> "v >= 0"))
    // the constraint commit is metadata-only and row-invisible
    assert(!TxLog.commitTouchesRows(spark, t, v1))
    assert(TxLog.checkConstraints(spark, t, asOf = Some(v1 - 1)).isEmpty,
      "time travel below the ADD must not see the constraint")
    val filesBefore = TxLog.snapshotFiles(spark, t).toSet
    val e = intercept[IllegalArgumentException] {
      TxLog.append(spark, t, Seq((3L, -1L)).toDF("k", "v"))
    }
    assert(e.getMessage.contains("v-nonneg") && e.getMessage.contains("1 rows"))
    assert(TxLog.snapshotFiles(spark, t).toSet == filesBefore,
      "a rejected append must not land data files")
    assert(TxLog.latestVersion(spark, t) == v1)
    // ADD over violating existing data fails, constraint set unchanged
    val e2 = intercept[IllegalArgumentException] {
      TxLog.addCheckConstraint(spark, t, "v-big", "v > 15")
    }
    assert(e2.getMessage.contains("1 existing rows violate"))
    assert(TxLog.checkConstraints(spark, t).keySet == Set("v-nonneg"))
    TxLog.dropCheckConstraint(spark, t, "v-nonneg")
    assert(TxLog.checkConstraints(spark, t).isEmpty)
    TxLog.append(spark, t, Seq((3L, -1L)).toDF("k", "v")) // now admitted
    assert(TxLog.read(spark, t).count() == 3)
  }

  test("NULL passes (SQL CHECK semantics); IS NOT NULL still rejects nulls") {
    val t = freshTable("txck-null")
    TxLog.append(spark, t,
      Seq((1L, Some(5L), "en")).toDF("k", "v", "lang"))
    TxLog.addCheckConstraint(spark, t, "v-cap", "v < 1000")
    TxLog.addCheckConstraint(spark, t, "lang-present", "lang IS NOT NULL")
    // null v → v < 1000 is NULL → passes
    TxLog.append(spark, t,
      Seq((2L, None: Option[Long], "de")).toDF("k", "v", "lang"))
    // null lang → IS NOT NULL is FALSE → rejected
    intercept[IllegalArgumentException] {
      TxLog.append(spark, t,
        Seq((3L, Some(7L), null: String)).toDF("k", "v", "lang"))
    }
    // a SUBSET append missing `lang` entirely reads as null → rejected
    // by lang-present, and the error names the right constraint
    val e = intercept[IllegalArgumentException] {
      TxLog.append(spark, t, Seq((4L, 8L)).toDF("k", "v"))
    }
    assert(e.getMessage.contains("lang-present"))
    assert(TxLog.read(spark, t).count() == 2)
  }

  test("malformed shapes are loud: unresolvable, non-boolean, nondeterministic, names") {
    val t = freshTable("txck-bad")
    TxLog.append(spark, t, Seq((1L, 2L)).toDF("k", "v"))
    intercept[IllegalArgumentException](
      TxLog.addCheckConstraint(spark, t, "ghost", "no_such_col > 0"))
    intercept[IllegalArgumentException](
      TxLog.addCheckConstraint(spark, t, "notbool", "v + 1"))
    intercept[IllegalArgumentException](
      TxLog.addCheckConstraint(spark, t, "coin", "rand() < 0.5"))
    intercept[IllegalArgumentException](
      TxLog.addCheckConstraint(spark, t, "Bad Name", "v > 0"))
    TxLog.addCheckConstraint(spark, t, "ok", "v > 0")
    intercept[IllegalArgumentException](
      TxLog.addCheckConstraint(spark, t, "ok", "v > 1")) // duplicate
    intercept[IllegalArgumentException](
      TxLog.dropCheckConstraint(spark, t, "missing"))
    assert(TxLog.checkConstraints(spark, t) == Map("ok" -> "v > 0"))
  }

  test("merge and overwrite are gated; compaction is not re-validated") {
    val t = freshTable("txck-paths")
    TxLog.append(spark, t, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    TxLog.append(spark, t, Seq((3L, 30L)).toDF("k", "v"))
    TxLog.addCheckConstraint(spark, t, "v-nonneg", "v >= 0")
    intercept[IllegalArgumentException] {
      TxLog.mergeMor(spark, t, Seq((2L, -5L)).toDF("k", "v"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      TxLog.overwrite(spark, t, Seq((9L, -9L)).toDF("k", "v"))
    }
    intercept[IllegalArgumentException] {
      TxLog.updateMorExpr(spark, t, "k = 1", Seq("v" -> "-1"))
    }
    // a conforming merge passes and the compaction of its output does
    // not re-scan (row-invisible by contract — would throw if the
    // rewrite were gated and the constraint had since tightened)
    TxLog.mergeMor(spark, t, Seq((2L, 25L)).toDF("k", "v"), Seq("k"))
    TxLog.compact(spark, t, 1)
    assert(TxLog.read(spark, t).orderBy("k").as[(Long, Long)].collect().toSeq
      == Seq((1L, 10L), (2L, 25L), (3L, 30L)))
  }

  test("a constraint commit between MV folds stays incremental, never a crash") {
    val base = java.nio.file.Files.createTempDirectory("txck-mv").toString
    val (src, mv) = (s"$base/src", s"$base/mv")
    TxLog.append(spark, src, Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
    graft.operators.MatView.refresh(spark, src, mv, Seq("k"), "v")
    // pure-metadata range → noop, not "no row changes"
    TxLog.addCheckConstraint(spark, src, "v-nonneg", "v >= 0")
    assert(graft.operators.MatView.refresh(spark, src, mv, Seq("k"), "v")
      == "noop")
    // metadata + append range → still an incremental fold
    TxLog.dropCheckConstraint(spark, src, "v-nonneg")
    TxLog.append(spark, src, Seq(("a", 5L)).toDF("k", "v"))
    assert(graft.operators.MatView.refresh(spark, src, mv, Seq("k"), "v")
      == "incremental")
    val got = TxLog.read(spark, mv).orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 2L, 6L), ("b", 1L, 2L)))
  }

  test("the streaming exactly-once append path is gated too") {
    val t = freshTable("txck-stream")
    TxLog.append(spark, t, Seq((1L, 10L)).toDF("k", "v"))
    TxLog.addCheckConstraint(spark, t, "v-nonneg", "v >= 0")
    intercept[IllegalArgumentException] {
      TxLog.appendIdempotent(spark, t, Seq((2L, -2L)).toDF("k", "v"),
        "app-ck", 0L)
    }
    assert(TxLog.appendIdempotent(spark, t, Seq((2L, 2L)).toDF("k", "v"),
      "app-ck", 0L).isDefined)
    assert(TxLog.read(spark, t).count() == 2)
  }

  test("ADD CONSTRAINT racing violating appends can never admit them (r16)") {
    val t = freshTable("txck-race")
    TxLog.append(spark, t, Seq((1L, 1L)).toDF("k", "v"))
    // writer thread: keeps landing VIOLATING rows; legal while no
    // constraint exists, must be rejected the instant one is active —
    // including the r15-advice window between the ADD's validation scan
    // and its meta commit (the add claims only validated-through+1, so
    // a violating append that lands first fails the claim and forces a
    // full re-validation)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writer = new Thread(() => {
      try {
        var i = 0
        while (!stop.get() && i < 60) {
          try TxLog.append(spark, t, Seq((1000L + i, -1L)).toDF("k", "v"))
          catch { case _: IllegalArgumentException => () } // gated: correct
          i += 1
        }
      } catch { case e: Throwable => errs.add(e) }
    })
    writer.start()
    var active = false
    var tries = 0
    while (!active && tries < 500) {
      tries += 1
      try { TxLog.addCheckConstraint(spark, t, "v_pos", "v >= 0"); active = true }
      catch {
        case e: IllegalArgumentException if e.getMessage.contains("violate") =>
          // violations landed BEFORE the constraint existed: clean, retry
          TxLog.deleteWhereMorExpr(spark, t, "v < 0")
        case e: IllegalArgumentException if e.getMessage.contains("contended") =>
          () // claim starved this round: retry
      }
    }
    stop.set(true)
    writer.join(300000)
    assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
    assert(active, "constraint add starved out entirely")
    // THE invariant (r15 advice): an active constraint is never active
    // over violating data, whatever the interleaving
    assert(TxLog.checkConstraints(spark, t).contains("v_pos"))
    assert(TxLog.read(spark, t).filter(col("v") < 0).count() == 0L,
      "a violating append slipped between validation and the meta commit")
  }

  test("SQL surface: ADD/DROP CONSTRAINT and SHOW CONSTRAINTS round-trip") {
    val t = freshTable("txck-sql")
    TxLog.append(spark, t, Seq((1L, 10L)).toDF("k", "v"))
    val v = spark.sql(s"ALTER TABLE graft.`$t` ADD CONSTRAINT V_Cap " +
      "CHECK (v < 100)").head().getLong(0)
    assert(v == TxLog.latestVersion(spark, t))
    assert(TxLog.checkConstraints(spark, t) == Map("v_cap" -> "v < 100"),
      "SQL names fold to lowercase")
    assert(spark.sql(s"SHOW CONSTRAINTS graft.`$t`").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("v_cap", "v < 100")))
    intercept[Exception](
      spark.sql(s"INSERT INTO graft.`$t` VALUES (2, 500)"))
    spark.sql(s"ALTER TABLE graft.`$t` DROP CONSTRAINT v_cap").head()
    assert(TxLog.checkConstraints(spark, t).isEmpty)
    spark.sql(s"INSERT INTO graft.`$t` VALUES (2, 500)")
    assert(TxLog.read(spark, t).count() == 2)
    // non-graft idents delegate untouched
    intercept[Exception](
      spark.sql("ALTER TABLE some_table ADD CONSTRAINT c CHECK (x > 0)"))
  }
}
