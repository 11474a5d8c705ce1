package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.{col, max, min}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import graft.sources.Tables

/** Testdata-encoding canary (VERDICT r7 task 2).
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * changed the `events.ts` parquet encoding once (TIMESTAMP(NANOS) →
  * TIMESTAMP(µs, NTZ)), which broke three tests in three different suites
  * with cryptic symptoms (1970 windows, ClassCastException). This suite is
  * the single loud place such a change fails first: it pins the contract
  * that the NORMALIZED loader always yields an instant TimestampType with
  * plausible values, whatever the file encoding underneath.
  */
class TestdataEncodingSpec extends SparkSpec {

  test("canary: Tables.events yields instant TimestampType with plausible (>=2020, <2100) values") {
    for (d <- Seq(sfTiny, sfSmall)) {
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$d/events.parquet: normalized ts is ${ev.schema("ts").dataType}, " +
          "not TimestampType — a new driver encoding fell through Tables.events")
      val r = ev.agg(min(col("ts")), max(col("ts"))).head()
      val (lo, hi) = (r.getAs[Timestamp](0), r.getAs[Timestamp](1))
      val y2020 = Timestamp.valueOf("2020-01-01 00:00:00")
      val y2100 = Timestamp.valueOf("2100-01-01 00:00:00")
      assert(lo.after(y2020) && hi.before(y2100),
        s"$d: ts range [$lo, $hi] implausible — wrong unit normalization " +
          "(nanos read as micros lands in 1970; micros read as nanos near epoch)")
    }
  }

  test("canary: the RAW events read differs from the loader (guards against a silently-dead normalization branch)") {
    // If this starts failing because raw == TimestampType, the driver now
    // writes instant timestamps and the normalization branches are dead —
    // prune them rather than letting unreachable code rot.
    val raw = spark.read.parquet(s"$sfTiny/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType,
      s"raw encoding changed again: ${raw.schema("ts").dataType} — " +
        "re-verify Tables.events + EventStreams.readEventStream cover it")
  }

  test("canary: streaming reader's normalized schema matches the batch loader exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-canary-events")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfTiny/events.parquet"))
    val streamSchema = graft.streaming.EventStreams.readEventStream(spark, dir.toString).schema
    val batchSchema = Tables.events(spark, sfTiny).schema
    assert(streamSchema == batchSchema,
      s"stream/batch schema drift:\n  stream=$streamSchema\n  batch =$batchSchema")
  }
}
