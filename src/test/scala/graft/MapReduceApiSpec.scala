package graft

import graft.mr.MapReduce
import graft.mr.MapReduce.{HashPartition, SortedPartition32}
import org.apache.spark.sql.functions.col

/** Port of the reference parser's property checks (O13/O14,
  * `wordcount_parser.py:28-38`) plus unit coverage of the typed MR
  * surface itself.
  */
class MapReduceApiSpec extends SparkSpec {
  private val testsDir = "/root/reference/map___reduce/tests"
  import spark.implicits._

  test("exactly-once emission per key (parser dup check)") {
    val out = graft.operators.TextPipeline
      .wordCount(spark, Seq(s"$testsDir/5.txt", s"$testsDir/10.txt"), 4)
      .collect()
    val keys = out.map(_.getString(0))
    assert(keys.distinct.length == keys.length, "a key was output twice")
  }

  test("effective mappers = min(numMappers, #files)  (tests/15.run: M=9, 3 files => 3)") {
    val files = Seq(s"$testsDir/5.txt", s"$testsDir/10.txt", s"$testsDir/11.txt")
    val capped = spark.read.textFile(files: _*).coalesce(math.min(9, files.size))
    assert(capped.rdd.getNumPartitions == 3)
  }

  test("reduce-side parallelism = numPartitions (tests/16.run: P=7)") {
    val out = MapReduce.run(
      spark, Seq(s"$testsDir/5.txt"),
      line => Iterator((line, "1")),
      (k, vs) => { var n = 0; while (vs.hasNext) { vs.next(); n += 1 }; Iterator((k, n.toString)) },
      numPartitions = 7)
    assert(out.rdd.getNumPartitions == 7)
  }

  test("sortedBucket32 replicates MR_SortedPartition incl. atoi overflow (tests/11.out:7-9)") {
    // C: (uint32)atoi(key) >> (32 - log2(P)); key 3333333333 wraps negative
    // as int32, re-reads as 3333333333 unsigned => bucket 3 of 4.
    val df = Seq("3", "3456346", "523654", "3333333333", "3344556677", "-5", "notanum")
      .toDF("key")
      .select(col("key"), MapReduce.sortedBucket32(col("key"), 4).as("b"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("3") == 0L)
    assert(got("3456346") == 0L)
    assert(got("523654") == 0L)
    assert(got("3333333333") == 3L)  // overflow wrap parity
    assert(got("3344556677") == 3L)
    assert(got("-5") == 3L)          // atoi(-5) -> (unsigned)(2^32-5) -> top bucket
    assert(got("notanum") == 0L)     // atoi garbage -> 0
  }

  test("sortedBucket32 parses an atoi-style numeric PREFIX, not the whole key") {
    // C atoi: skip whitespace, optional sign, digit run, stop at the first
    // non-digit — "42abc" parses as 42 where a whole-string cast gives 0
    val df = Seq("3333333333abc", "  42xyz", "+7tail", "-5.9", "x42", "")
      .toDF("key")
      .select(col("key"), MapReduce.sortedBucket32(col("key"), 4).as("b"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("3333333333abc") == 3L) // prefix wraps exactly like the bare key
    assert(got("  42xyz") == 0L)       // whitespace + digits
    assert(got("+7tail") == 0L)        // explicit sign
    assert(got("-5.9") == 3L)          // parses -5, ignores the fraction
    assert(got("x42") == 0L)           // no leading digits -> atoi 0
    assert(got("") == 0L)
    // full C isspace() set: vertical tab and form feed also skip
    val ws = Seq("3333333333", "\f42")
      .toDF("key")
      .select(col("key"), MapReduce.sortedBucket32(col("key"), 4).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ws("3333333333") == 3L)
    assert(ws("\f42") == 0L)
  }

  test("sortedBucket32 with one partition is always 0 (mapreduce.c:230-232 guard)") {
    val df = Seq("7", "4000000000").toDF("key")
      .select(MapReduce.sortedBucket32(col("key"), 1).as("b"))
    assert(df.collect().forall(_.getLong(0) == 0L))
  }

  test("reducer sees values of one key as a contiguous streaming run (get_next contract)") {
    val seen = MapReduce.run(
      spark, Seq(s"$testsDir/4.txt"), // 4 lines: duplicates of a tiny key set
      line => Iterator((line, "v")),
      (k, vs) => {
        var n = 0
        while (vs.hasNext) { assert(vs.next() == "v"); n += 1 }
        Iterator((k, n.toString))
      },
      numPartitions = 2)
    val total = seen.collect().map(_._2.toInt).sum
    assert(total == 4, "every emitted value must reach exactly one reducer run")
  }

  test("unconsumed values are drained between runs") {
    val out = MapReduce.run(
      spark, Seq(s"$testsDir/4.txt"),
      line => Iterator((line, "v")),
      (k, _) => Iterator((k, "x")), // never consumes the iterator
      numPartitions = 1)
    val keys = out.collect().map(_._1)
    assert(keys.distinct.length == keys.length, "runs bled into each other")
  }

  test("empty input file yields empty output (no phantom groups)") {
    val f = java.nio.file.Files.createTempFile("graft-empty", ".txt")
    val out = graft.operators.TextPipeline.wordCount(spark, Seq(f.toString), 2)
    assert(out.count() == 0)
  }

  test("unicode lines survive the pipeline intact") {
    val f = java.nio.file.Files.createTempFile("graft-uni", ".txt")
    java.nio.file.Files.writeString(f, "héllo wörld\n héllo wörld\nこんにちは\nhéllo wörld\n")
    val out = graft.operators.TextPipeline.wordCount(spark, Seq(f.toString), 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("héllo wörld") == "2")       // exact line, with leading space distinct
    assert(out(" héllo wörld") == "1")
    assert(out("こんにちは") == "1")
  }

  test("result invariant under partition count (reference test-matrix axis)") {
    val files = Seq(s"$testsDir/1.txt", s"$testsDir/2.txt", s"$testsDir/3.txt")
    val results = Seq(1, 4, 7).map { p =>
      graft.operators.TextPipeline.wordCount(spark, files, p)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    }
    assert(results(0) == results(1) && results(1) == results(2))
  }
}
