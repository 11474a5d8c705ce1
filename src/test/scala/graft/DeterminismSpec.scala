package graft

/** The determinism discipline, tested: every query must produce
  * bit-identical results regardless of physical execution layout —
  * shuffle partitioning, parallelism, evaluation order. This is what the
  * decimal-exact sums, rounded ratios, and total ORDER BYs buy; a float
  * sum or an un-tiebroken rank would fail here intermittently.
  */
class DeterminismSpec extends SparkSpec {

  // queries with float-sensitive arithmetic or rank tiebreaks — the ones
  // that would betray order-dependence first
  private val sensitive = Seq("q4_multi_agg", "q9_running_sum",
    "q8_topk_per_group", "qs_cosine_topk", "qd_ngram_jaccard", "qt_quality",
    // round-6: hash-ranked sampling (tiebreak discipline), per-record
    // codec decode (mapPartitions layout independence), and the theta
    // overlap (a sketch is a SET function — layout must not move the
    // estimate; KLL is deliberately absent: its compaction is randomized
    // and only rank BOUNDS are the cross-run contract)
    "qp_sample", "qm_video_stats", "qm_frame_sample", "qk_theta_overlap")

  private def fingerprint(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfTiny)
    df.collect().map(_.toString).mkString("\n")
  }

  for (name <- sensitive) {
    test(s"$name is bit-identical across shuffle-partition layouts") {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        val a = fingerprint(name)
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val b = fingerprint(name)
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        val c = fingerprint(name)
        assert(a == b && b == c, s"$name varies with physical layout")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
