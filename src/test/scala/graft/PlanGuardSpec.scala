package graft

import org.apache.spark.sql.functions._

/** Plan-structure guards: the scale-critical physical-plan properties,
  * asserted so a refactor that silently loses one (a filter that stops
  * pushing, a join that degrades to nested-loop, a window that funnels to
  * one partition) fails CI instead of surfacing at 100 TB.
  */
class PlanGuardSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfTiny).queryExecution.executedPlan.toString

  test("per-group top-k queries carry a partial WindowGroupLimit (map-side pruning)") {
    for (q <- Seq("q8_topk_per_group", "qs_cosine_topk", "qp_sample",
      "qp_weighted_sample", "qs_hard_negatives")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"), s"$q lost its group-limit pushdown:\n$p")
    }
  }

  test("no accidental cartesian products or nested-loop joins in pair generation") {
    for (q <- Seq("qd_ngram_jaccard", "qd_minhash_lsh", "qd_simhash",
      "qt_substring_dup", "qt_substring_scrub")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degraded to an all-pairs join:\n$p")
    }
    // qt_bigram_surprise attaches its 1-row vocab scalar via a broadcast
    // Cross BNLJ — that is Spark's scalar-attach shape, not an all-pairs
    // hazard; the guard instead pins that NOTHING ELSE nested-loops
    val p = plan("qt_bigram_surprise")
    assert(!p.contains("CartesianProduct"), s"qt_bigram_surprise cartesian:\n$p")
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      s"qt_bigram_surprise: more than the scalar-attach BNLJ:\n$p")
  }

  test("the round-7 text operators prune the documents scan to the columns they read") {
    // a scan that hauls lang/source/n_chars (or the props json) for a
    // (doc_id, text) computation reads multiples of the needed bytes at
    // 100 TB — ReadSchema is where column pruning is visible
    for (q <- Seq("qt_substring_dup", "qt_substring_scrub", "qt_bigram_surprise")) {
      val p = plan(q)
      val reads = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
      assert(reads.nonEmpty, s"$q: no file scan found:\n$p")
      reads.foreach { l =>
        assert(!l.contains("lang") && !l.contains("source") && !l.contains("props"),
          s"$q reads columns it never uses: $l")
      }
    }
  }

  test("no single-partition window anywhere in the query surface") {
    // 'Window ... ORDER BY' without PARTITION BY plans an Exchange
    // SinglePartition directly under a Window — the q9 anti-pattern.
    // No exemptions: q9's offsets are now an equi-aggregate, not a window.
    for ((name, fn) <- SparkEntry.queries) {
      val p = fn(spark, sfTiny).queryExecution.executedPlan.toString
      val lines = p.linesIterator.toSeq
      lines.zipWithIndex.filter(_._1.contains("Window")).foreach { case (_, i) =>
        val below = lines.slice(i + 1, i + 3).mkString("\n")
        assert(!below.contains("Exchange SinglePartition"),
          s"$name funnels a window through one partition:\n$p")
      }
    }
  }

  test("retrieval queries rank-limit via TakeOrdered before any global window") {
    // bm25/rrf rank a bounded candidate set: the plan must carry
    // TakeOrderedAndProject (per-partition heaps, driver merge of topN)
    // with the row_number window applied only to that bounded tail — a
    // global window over every scored doc would funnel the corpus
    // through one task at 100 TB
    for (q <- Seq("qt_bm25", "qs_hybrid_rrf")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q lost its rank-limit pushdown (global sort instead of top-N heaps):\n$p")
    }
  }

  test("qt_bm25 prunes the documents scan and broadcasts its stats row") {
    val p = plan("qt_bm25")
    val reads = p.linesIterator.filter(l =>
      l.contains("ReadSchema") && l.contains("documents")).toSeq
    assert(reads.nonEmpty, s"qt_bm25: no documents scan found:\n$p")
    reads.foreach { l =>
      assert(!l.contains("lang") && !l.contains("source") && !l.contains("n_chars"),
        s"qt_bm25 reads columns it never uses: $l")
    }
    // the (N, Σdl, df) stats row attaches via broadcast — never a shuffle
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"qt_bm25 stats row is not broadcast:\n$p")
  }

  test("self-join pipelines reuse the shared exchange at shuffle-join scale") {
    // At test/bench SF the small side broadcasts — there is no shuffle
    // pair to reuse and the build side is computed once anyway. Disabling
    // broadcast simulates the 100 TB shape, where the self-join MUST
    // collapse its two identical sides into one exchange + ReusedExchange
    // or every fingerprint/sketch is computed (and shuffled) twice.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      for (q <- Seq("qd_simhash", "qd_minhash_lsh", "qs_embed_neardup", "qd_ngram_jaccard")) {
        val df = SparkEntry.queries(q)(spark, sfTiny)
        df.collect() // AQE finalizes reuse only in the executed plan
        val p = df.queryExecution.executedPlan.toString
        // compute-once proof comes in two shapes: ReusedExchange (the
        // identical shuffle collapsed) or InMemoryTableScan (the shared
        // input persisted — qd_ngram_jaccard caches its filtered shingle
        // stream, an even stronger guarantee: one materialization for
        // ALL consumers, not just the two join sides)
        assert(p.linesIterator.exists(l =>
          l.contains("ReusedExchange") || l.contains("reuses") ||
            l.contains("InMemoryTableScan")),
          s"$q recomputes its self-join side instead of reusing the exchange:\n$p")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("runtime bloom filter from a selective dim reaches the fact scan (shuffle-join shape)") {
    // At 100 TB the fact side of a selective join must be pre-filtered at
    // the SCAN by a bloom filter built from the filtered dim — otherwise
    // the full fact table shuffles only to be discarded by the join.
    // Thresholds are lowered to make the tiny test corpus eligible; the
    // FEATURE and plan shape are exactly what fires at scale.
    val sets = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = sets.map { case (k, _) => k -> spark.conf.get(k) }
    sets.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val d = sfSmall
      val fact = graft.sources.Tables.lineitem(spark, d).select("l_orderkey", "l_quantity")
      val dim = graft.sources.Tables.orders(spark, d)
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 97 === 0)
        .select("o_orderkey")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("might_contain"),
        s"no runtime bloom filter on the fact scan:\n$p")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    // Partition-pruning's join-driven form: the fact is partitioned on
    // the join key's proxy column; filtering the DIM must inject a
    // dynamicpruning subquery into the fact scan so only matching
    // partitions are read — the mechanism star-schema queries live on.
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val orders = graft.sources.Tables.orders(spark, sfSmall)
      .withColumn("prio", col("o_orderpriority"))
    graft.sources.FileFormats.writePartitioned(orders, dir, "prio")
    val fact = spark.read.parquet(dir)
    // the dim filter is on a NON-join column: a literal filter on the
    // join key itself gets constant-propagated into a STATIC partition
    // filter (also verified pruning, but not the dynamic mechanism)
    val dim = orders.filter(col("o_custkey") % 1000 === 7)
      .select(col("o_orderpriority").as("p")).distinct()
    val joined = fact.join(dim, col("prio") === col("p"))
      .agg(count(lit(1)))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"fact scan lacks a dynamic partition pruning subquery:\n$p")
  }

  test("contamination check broadcasts the eval side; the train corpus never shuffles pre-join") {
    // The 100 TB contract of qt_contamination: both joins (span injection,
    // shingle match) must be broadcast — eval sets are small by nature —
    // so the only Exchange in the plan is the final per-pair aggregate.
    val p = plan("qt_contamination")
    val broadcasts = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 2, s"qt_contamination lost an eval-side broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"qt_contamination shuffles the train corpus into a join:\n$p")
  }

  test("dimension joins broadcast the bounded dims (q5, q6)") {
    for (q <- Seq("q5_join", "q6_multi_join")) {
      assert(plan(q).contains("BroadcastHashJoin"), s"$q lost its broadcast:\n${plan(q)}")
    }
  }

  test("injected rule broadcasts bounded dims even without an explicit hint") {
    // kill both fallbacks that could mask the rule: the size-threshold
    // auto-broadcast and an explicit broadcast() call — the UNHINTED join
    // must still plan as broadcast because BroadcastBoundedDims tags the
    // nation scan side
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      import org.apache.spark.sql.functions.col
      val df = graft.sources.Tables.customer(spark, sfTiny)
        .join(graft.sources.Tables.nation(spark, sfTiny) // no broadcast()
            .filter(col("n_nationkey") >= 0),            // rule must see through this
          col("c_nationkey") === col("n_nationkey"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"unhinted bounded-dim join degraded to a shuffle join:\n$p")
      // control: the same join against SUPPLIER (unbounded, grows with SF)
      // must NOT be force-broadcast by the rule
      val ctrl = graft.sources.Tables.customer(spark, sfTiny)
        .join(graft.sources.Tables.supplier(spark, sfTiny),
          col("c_nationkey") === col("s_nationkey"))
      ctrl.collect()
      val cp = ctrl.queryExecution.executedPlan.toString
      assert(!cp.contains("BroadcastHashJoin"),
        s"rule over-reached onto an unbounded table:\n$cp")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("global top-k plans as TakeOrderedAndProject, not a full sort") {
    for (q <- Seq("q20_limit", "q36_order_revenue")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q:\n$p")
      assert(!p.contains("Exchange rangepartitioning"), s"$q fell back to a global sort:\n$p")
    }
  }

  test("ANALYZE'd catalog tables drive cost-based join reorder on ad-hoc SQL") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    graft.sources.Stats.analyzeAll(spark, sfTiny,
      Seq("lineitem", "orders", "customer", "nation"))
    // deliberately mis-ordered: the two FACT tables join first
    // syntactically; the selective customer filter should join first
    val sql =
      "SELECT count(*) FROM g_lineitem l " +
      "JOIN g_orders o ON l.l_orderkey = o.o_orderkey " +
      "JOIN g_customer c ON o.o_custkey = c.c_custkey " +
      "WHERE c.c_nationkey = 1"
    def innermostJoin(p: LogicalPlan): String = {
      val joins = p.collect { case j: Join => j }
      assert(joins.size == 2, s"expected a 2-join chain, got:\n$p")
      joins.find(j => j.children.forall(c =>
        c.collect { case x: Join => x }.isEmpty)).get.toString
    }
    // without stats-based costing: syntactic order, lineitem⋈orders first
    val plain = innermostJoin(spark.sql(sql).queryExecution.optimizedPlan)
    assert(plain.contains("g_lineitem") && plain.contains("g_orders") &&
      !plain.contains("g_customer"),
      s"baseline (no CBO) should keep syntactic join order:\n$plain")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try {
      // ANALYZE's row counts are visible to the optimizer
      val rc = spark.table("g_nation").queryExecution.optimizedPlan.stats.rowCount
      assert(rc.contains(BigInt(25)), s"g_nation rowCount stat missing: $rc")
      // ...and the filtered dimension now joins FIRST
      val cbo = innermostJoin(spark.sql(sql).queryExecution.optimizedPlan)
      assert(cbo.contains("g_customer"),
        s"CBO + stats failed to reorder the filtered dim inward:\n$cbo")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
    }
  }

  test("analyzeAll survives a quote in the data directory and the prefix") {
    // a path (or prefix) containing a single quote / backtick must be
    // escaped into the CREATE TABLE statement, not break it
    // absolute path: CREATE TABLE resolves relative LOCATIONs against the
    // warehouse dir, not the working directory
    val dir = new java.io.File("target/tmp/quote'dir").getAbsoluteFile
    graft.sources.Tables.region(spark, sfTiny)
      .write.mode("overwrite").parquet(s"${dir.getPath}/region.parquet")
    val names = graft.sources.Stats.analyzeAll(spark, dir.getPath,
      Seq("region"), prefix = "gq_")
    assert(names == Seq("gq_region"))
    assert(spark.table("gq_region").count() == 5)
    // row-count stats only surface in plan.stats under CBO costing
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val rc = spark.table("gq_region").queryExecution.optimizedPlan.stats.rowCount
      assert(rc.contains(BigInt(5)), s"ANALYZE stats missing through quoted path: $rc")
    } finally spark.conf.unset("spark.sql.cbo.enabled")
    spark.sql("DROP TABLE IF EXISTS gq_region")
  }

  test("native expressions stay inside whole-stage codegen spans") {
    for ((q, fnName) <- Seq(("qd_simhash", "simhash64"),
                            ("qs_cosine_topk", "cosine_similarity"))) {
      val df = SparkEntry.queries(q)(spark, sfTiny)
      df.collect() // AQE plans only show codegen spans once finalized
      val p = df.queryExecution.executedPlan.toString
      val inCodegen = p.linesIterator.exists(l => l.contains("*(") && l.contains(fnName))
      assert(inCodegen, s"$q: $fnName fell out of codegen:\n$p")
    }
  }
}
