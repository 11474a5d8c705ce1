package graft

import graft.sources.Tables

/** The `spark.sql` surface: every oracle SQL string that is also valid
  * Spark SQL must produce exactly the DataFrame program's result. This
  * pins API-vs-SQL parity (a user of this engine can write either) and
  * doubles as a second differential check of the oracle strings
  * themselves. Queries using DuckDB-only syntax (list lambdas,
  * string_split, FILTER clauses, `//`) are excluded.
  */
class SqlParitySpec extends SparkSpec {

  private val sparkParsable = Seq(
    "q1_distinct", "q2_group_count", "q3_filter_project", "q4_multi_agg",
    "q5_join", "q6_multi_join", "q7_anti_join", "q7_semi_join",
    "q8_topk_per_group", "q9_running_sum", "q10_intersect", "q11_string_fns",
    "q12_date_fns", "q13_time_window", "q14_rollup", "q15_count_distinct", "q16_doc_stats",
    "q17_union_all", "q18_except", "q19_left_outer", "q19_full_outer",
    "q20_limit", "q21_rank_lag_lead", "q23_cube", "q27_edit_distance",
    "q28_null_fns", "q29_null_agg", "q30_empty_result",
    // q33's oracle uses DuckDB's two-arg GROUPING(a,b); Spark spells that
    // grouping_id(), so only the set-op ALL pair joins the parity list
    "q31_intersect_all", "q32_except_all", "q36_order_revenue",
    "q37_range_frame", "q38_rank_stats", "q39_math_fns",
    // round-4 widening: scalar subquery (comma-join spelling), correlated
    // EXISTS, and the UNION-ALL unpivot are all plain ANSI; q43's oracle
    // needs DuckDB's zip-unnest and stays DuckDB-only
    "q40_scalar_subquery", "q41_exists_subquery", "q42_unpivot",
    // temporal pack: the interval-join and gaps-and-islands oracles are
    // plain ANSI (qe_asof's ASOF JOIN and qp's arg_min are DuckDB-only)
    "qe_attribution", "qe_sessions",
    // the PageRank oracle's unrolled CTE iterations are plain ANSI too —
    // Spark executes the same 3-iteration SQL the oracle engine runs
    "qg_pagerank",
    // round-6: the deterministic-sampling oracle (ROW_NUMBER over a
    // seeded md5) is plain ANSI — both engines draw the same sample
    "qp_sample",
    // round-9: the BFS unroll (chained CTEs + NOT IN) and the
    // snapshot-diff (FULL OUTER + IS DISTINCT FROM) are plain ANSI;
    // the versioned-table oracle is a bare identity SELECT
    "qg_khop", "qw_snapshot_diff", "qw_txlog_read")

  test("every query has an oracle and every oracle has a query (no_oracle is empty)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"queries-only: ${q -- o}; oracles-only: ${o -- q}")
  }

  for (name <- sparkParsable) {
    test(s"$name: spark.sql(oracle SQL) == DataFrame program") {
      Tables.registerAll(spark, sfTiny)
      val viaSql = spark.sql(SparkEntry.oracleSql(name))
        .collect().map(_.toString).toSeq
      val viaApi = SparkEntry.queries(name)(spark, sfTiny)
        .collect().map(_.toString).toSeq
      assert(viaSql == viaApi,
        s"first diff: ${viaSql.zip(viaApi).find(p => p._1 != p._2)}")
    }
  }
}
