package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** PageRank ([[Graph.pageRank]]): the declared query is oracle-checked
  * (qg_pagerank vs 3 unrolled CTE iterations in the oracle engine); this
  * spec pins the closed-form cases and invariants the oracle can't see.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("2-cycle is a fixed point: both nodes stay at exactly 1/2") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val scores = Graph.pageRank(edges, iterations = 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // (1-d)/2 + d * 1/2 = 1/2 for any damping — an exact invariant
    assert(math.abs(scores(1L) - 0.5) < 1e-12)
    assert(math.abs(scores(2L) - 0.5) < 1e-12)
  }

  test("star graph ranks the hub first; leaves keep only the teleport mass") {
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val scores = Graph.pageRank(edges, iterations = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // after one round: hub = 0.15/4 + 0.85 * (3 * 0.25), leaf = 0.15/4
    assert(math.abs(scores(1L) - 0.675) < 1e-12)
    Seq(2L, 3L, 4L).foreach(l => assert(math.abs(scores(l) - 0.0375) < 1e-12))
  }

  test("mass conservation: no dangling nodes -> scores sum to exactly 1") {
    // 4-cycle: every node has an out-edge, so no mass leaks
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val total = Graph.pageRank(edges, iterations = 3)
      .agg(sum("score")).collect()(0).getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("dangling nodes absorb: total mass decays but stays positive and bounded") {
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val total = Graph.pageRank(edges, iterations = 3)
      .agg(sum("score")).collect()(0).getDouble(0)
    assert(total > 0 && total <= 1.0 + 1e-9)
  }

  test("redistributeDangling: total mass stays exactly 1 every round") {
    // node 1 -> 2; node 2 dangles. Closed form after one round with
    // redistribution: dm = 0.5, score(x) = 0.15/2 + 0.85*(c + dm/2)
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val one = Graph.pageRank(edges, iterations = 1, redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(one(1L) - (0.075 + 0.85 * 0.25)) < 1e-12)
    assert(math.abs(one(2L) - (0.075 + 0.85 * 0.75)) < 1e-12)
    // ...and the invariant holds over more rounds and a bigger graph
    val star = Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val total = Graph.pageRank(star, iterations = 4, redistributeDangling = true)
      .agg(sum("score")).collect()(0).getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9,
      s"dangling redistribution must conserve probability mass, got $total")
    // without redistribution the same graph leaks mass (the documented
    // absorbing default) — the flag is what restores conservation
    val absorbed = Graph.pageRank(star, iterations = 4)
      .agg(sum("score")).collect()(0).getDouble(0)
    assert(absorbed < 1.0 - 1e-6)
  }

  test("deterministic across runs on the synthetic orders graph") {
    val a = Graph.qgPageRank(spark, sfTiny).collect().toSeq
    val b = Graph.qgPageRank(spark, sfTiny).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("triangleStats: hand-counted K4-plus-tail, canonicalization collapses noise") {
    // K4 on {1,2,3,4} = 4 triangles, plus a tail 4-5 (no new triangle).
    // Noise: a self-loop, a duplicate, and a reversed duplicate — all
    // must collapse in the canonical undirected edge set.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L),
      (5L, 5L),           // self-loop: dropped
      (2L, 1L), (3L, 1L)) // reversed dupes: collapsed
      .toDF("src", "dst")
    val r = Graph.triangleStats(edges).collect()(0)
    assert(r.getLong(0) == 5L, s"n_nodes: $r")
    assert(r.getLong(1) == 7L, s"n_edges: $r")
    // degrees: 1,2->3; 3->3; 4->4; 5->1 => wedges 3+3+3+6+0 = 15
    assert(r.getLong(2) == 15L, s"n_wedges: $r")
    assert(r.getLong(3) == 4L, s"n_triangles: $r")
    assert(r.getDouble(4) == 0.8, s"gcc 3*4/15: $r")
  }

  test("localClustering: triangle corners score 1.0, the hub is diluted, pendants excluded") {
    // K3 on 1-2-3 plus a pendant 4 on node 1: lcc(2) = lcc(3) = 1.0
    // (their whole neighborhood is a clique), lcc(1) = 2*1/(3*2) =
    // 0.333333, node 4 (deg 1) has no defined lcc and must not appear
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("src", "dst")
    val got = Graph.localClustering(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      1L -> (3L, 1L, 0.333333), 2L -> (2L, 1L, 1.0), 3L -> (2L, 1L, 1.0)),
      got.toString)
  }

  test("kHopDistances: min distance wins, horizon truncates, multi-source floods independently") {
    import spark.implicits._
    // path 1→2→3→4→5→6 plus a shortcut 1→4: node 4 is dist 1 (the
    // shortcut, not the 3-hop path), 5 is 2, 6 is 3; a second source 10
    // with 10→11 floods its own component; 20→1 points INTO the source
    // (1 stays dist 0, 20 is never reached — edges are directed)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (1L, 4L),
      (1L, 2L), // duplicate edge: collapsed
      (10L, 11L), (20L, 1L)).toDF("src", "dst")
    val sources = Seq(1L, 10L).toDF("node")
    val got = Graph.kHopDistances(edges, sources, maxHops = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L,
      10L -> 0L, 11L -> 1L), got.toString)
    // widening the horizon reaches 6 (1→4→5→6) but still never 20
    val far = Graph.kHopDistances(edges, sources, maxHops = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(far(6L) == 3L && !far.contains(20L), far.toString)
  }

  test("kHopDistances matches Floyd–Warshall on a random 30-node graph (model check)") {
    import spark.implicits._
    val n = 30
    val rng = new scala.util.Random(7)
    val edgeSet = (for (_ <- 1 to 90) yield
      (rng.nextInt(n).toLong, rng.nextInt(n).toLong)).distinct
        .filter { case (a, b) => a != b }
    val maxHops = 5
    // reference: all-pairs shortest hop counts, then min over sources
    val INF = Int.MaxValue / 4
    val dist = Array.fill(n, n)(INF)
    (0 until n).foreach(i => dist(i)(i) = 0)
    edgeSet.foreach { case (a, b) => dist(a.toInt)(b.toInt) = 1 }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (dist(i)(k) + dist(k)(j) < dist(i)(j))
        dist(i)(j) = dist(i)(k) + dist(k)(j)
    val sources = Seq(0L, 13L, 29L)
    val expected = (0 until n).flatMap { v =>
      val d = sources.map(s => dist(s.toInt)(v)).min
      if (d <= maxHops) Some(v.toLong -> d.toLong) else None
    }.toMap
    val got = Graph.kHopDistances(
      edgeSet.toDF("src", "dst"), sources.toDF("node"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"BFS vs Floyd–Warshall:\n got $got\n exp $expected")
    // the bloom-refined path is the SAME function (two-tier split is
    // lossless: bloom has no false negatives, fps re-dropped exactly)
    val refined = Graph.kHopDistances(
      edgeSet.toDF("src", "dst"), sources.toDF("node"), maxHops,
      bloomRefine = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(refined == expected, s"bloom-refined BFS diverges:\n got $refined")
  }

  test("triangleStatsApprox: deterministic sample, integer-exact 1/p³ scaling, bounded error") {
    import org.apache.spark.sql.functions.col
    val edges = graft.sources.Tables.orders(spark, sfSmall)
      .select(col("o_custkey").as("src"),
        ((col("o_orderkey") * 7) % 1500 + 1).as("dst"))
    val exact = Graph.triangleStats(edges).collect().head.getLong(3)
    val r1 = Graph.triangleStatsApprox(edges).collect().head
    val r2 = Graph.triangleStatsApprox(edges).collect().head
    assert((r1.getLong(0), r1.getLong(1)) == (r2.getLong(0), r2.getLong(1)),
      "md5 sampling must be deterministic across runs")
    // p = 0x80/0x100 = 1/2 ⇒ the estimate is EXACT integer math
    assert(r1.getLong(1) == r1.getLong(0) * 8, r1.toString)
    // realized error on this graph: 7.3% (seed 42); DOULION's
    // concentration keeps seeds 7/99 at 4.8%/11.1% too — assert the
    // 15% certificate the oracle row pins
    for (seed <- Seq(42L, 7L, 99L)) {
      val est = Graph.triangleStatsApprox(edges, seed = seed).collect().head.getLong(1)
      assert(math.abs(est - exact) <= 0.15 * exact,
        s"seed $seed: est $est vs exact $exact")
    }
    // the declared row carries the certificate itself
    val row = Graph.qgTrianglesApprox(spark, sfSmall).collect().head
    assert(row.getLong(2) == exact && row.getBoolean(3), row.toString)
  }

  test("kHopDistances bloomRefine ≡ plain on the real qg_khop graph") {
    val plainQ = {
      val edges = graft.sources.Tables.orders(spark, sfTiny)
        .select(org.apache.spark.sql.functions.col("o_custkey").as("src"),
          ((org.apache.spark.sql.functions.col("o_orderkey") * 7) % 1500 + 1).as("dst"))
      val nodes = edges.select(org.apache.spark.sql.functions.col("src").as("node"))
        .union(edges.select(org.apache.spark.sql.functions.col("dst").as("node"))).distinct()
      val seeds = nodes.filter(org.apache.spark.sql.functions.col("node") % 100 === 1)
      (Graph.kHopDistances(edges, seeds, 4, bloomRefine = false),
        Graph.kHopDistances(edges, seeds, 4, bloomRefine = true))
    }
    val plain = plainQ._1.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val refined = plainQ._2.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(refined == plain,
      s"${refined.size} vs ${plain.size} rows; first diff: " +
        refined.zip(plain).find(p => p._1 != p._2).toString)
  }
}
