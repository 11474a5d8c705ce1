package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev aid: amplify an SF directory ~N× with STRUCTURE-PRESERVING copies,
  * for scale smokes beyond the largest generated SF (the "does the plan
  * survive 10× ?" empirical check in PERF.md — run once, not in CI).
  *
  * Naive row duplication would be wrong for the interesting queries:
  * byte-identical documents/embeddings make every original near-dup PAIR
  * appear copies² times (a 100× quadratic blowup dressed up as 10× data),
  * while key collisions would corrupt join cardinalities. Instead each
  * copy `i` is remapped into its own disjoint universe, so per-copy
  * workload structure is EXACTLY the original and totals scale linearly:
  *  - relational tables: every key (+ its foreign-key references) shifts
  *    by i·10⁹ — join fan-outs and group sizes are copy-identical;
  *  - documents: every token gets a copy suffix — within-copy shingle
  *    overlap (and thus the pair/cluster structure) is byte-for-byte the
  *    original's, cross-copy overlap is zero;
  *  - embeddings: coordinates cyclically rotated by i — an orthogonal
  *    transform, so within-copy pairwise cosines are bit-preserved and
  *    cross-copy similarities are near-random (few spurious candidates);
  *  - events: user universe shifts per copy — per-user session/as-of
  *    structure unchanged, 10× users;
  *  - region/nation are BOUNDED dims (that is the point of them) and are
  *    copied through unscaled.
  *
  * Usage: sbt "Test/runMain graft.ScaleUp <srcSfDir> <outDir> <copies>"
  */
object ScaleUp {

  private val KeyOffset = 1000000000L

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("testdata-scaled/sf1x")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.builder("graft-scaleup", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    require(copies >= 1 && copies <= 64,
      s"copies must be in [1, 64] (embedding rotation is per-coordinate), got $copies")
    def amplify(name: String, perCopy: (DataFrame, Int) => DataFrame): Unit = {
      val base = graft.sources.Tables.load(spark, src, name)
      val all = (0 until copies).map(i => perCopy(base, i)).reduce(_ unionAll _)
      all.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name -> ${copies}x")
    }
    def copyThrough(name: String): Unit = {
      graft.sources.Tables.load(spark, src, name)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name -> unscaled (bounded dim)")
    }
    def shift(c: String, i: Int) = col(c) + lit(i.toLong * KeyOffset)

    // ONE copy, not `copies` identical ones: duplicated dim keys would
    // fan every nation/region join out copies× (corrupted cardinalities)
    copyThrough("region")
    copyThrough("nation")
    // c_name feeds the fuzzy join (edit distance ≤ 1): identical names
    // across copies would make every original fuzzy PAIR appear copies²
    // times (measured 22× wall on the declared row — the quadratic
    // blowup this generator exists to avoid). A 2-char per-copy prefix
    // (aa, bb, …) keeps within-copy edit structure EXACTLY the
    // original's and puts every cross-copy pair at distance ≥ 2 — out
    // of the k=1 (and k=2 deletion-variant) reach.
    amplify("customer", (df, i) => df
      .withColumn("c_custkey", shift("c_custkey", i))
      .withColumn("c_name",
        concat(lit(('a' + i).toChar.toString * 2), col("c_name"))))
    amplify("supplier", (df, i) => df.withColumn("s_suppkey", shift("s_suppkey", i)))
    amplify("part", (df, i) => df.withColumn("p_partkey", shift("p_partkey", i)))
    amplify("orders", (df, i) => df
      .withColumn("o_orderkey", shift("o_orderkey", i))
      .withColumn("o_custkey", shift("o_custkey", i)))
    amplify("lineitem", (df, i) => df
      .withColumn("l_orderkey", shift("l_orderkey", i))
      .withColumn("l_partkey", shift("l_partkey", i))
      .withColumn("l_suppkey", shift("l_suppkey", i)))
    // events: read through the loader so nanos-long ts normalizes to µs
    // once; the scaled copy is then a plain timestamp column
    val ev = graft.sources.Tables.events(spark, src)
    (0 until copies).map(i => ev
      .withColumn("event_id", shift("event_id", i))
      .withColumn("user_id", shift("user_id", i)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    println(s"[scaleup] events -> ${copies}x")
    amplify("documents", (df, i) =>
      if (i == 0) df
      else df
        .withColumn("doc_id", shift("doc_id", i))
        .withColumn("text",
          array_join(transform(split(col("text"), " "), t => concat(t, lit(s"_$i"))), " "))
        .withColumn("n_chars", length(col("text"))))
    amplify("embeddings", (df, i) =>
      if (i == 0) df
      else df
        .withColumn("vec_id", shift("vec_id", i))
        // cyclic rotation by i, dimension read from the data (a
        // hardcoded dim would silently corrupt other-width corpora)
        .withColumn("embedding",
          expr(s"concat(slice(embedding, ${i + 1}, size(embedding) - $i), " +
            s"slice(embedding, 1, $i))")))
    spark.stop()
  }
}
