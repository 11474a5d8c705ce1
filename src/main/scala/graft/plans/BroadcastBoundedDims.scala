package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{HintInfo, Join, JoinHint, LogicalPlan, BROADCAST}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Injected optimizer rule ([[graft.GraftExtensions]]): broadcast-hint any
  * join side that scans one of the GENUINELY bounded dimension tables
  * (region/nation — O(10..100) rows at every scale factor, see
  * [[graft.sources.Tables.broadcastable]]).
  *
  * Why a rule instead of relying on `broadcast(df)` at every call site:
  * the dimension's boundedness is a property of the TABLE, not of each
  * query — one forgotten hint in a new query (or one written by a SQL
  * user who never sees the Scala loaders) silently degrades to a shuffle
  * join on a 100 TB fact side. Statistics-based selection can also miss:
  * `autoBroadcastJoinThreshold` compares estimated sizes, and a dim
  * behind a filter/projection may lack stats.
  *
  * Strictly semantics-preserving: it only SETS a join-strategy hint, and
  * only where the user left that side's hint empty — an explicit user
  * hint (e.g. forcing SHUFFLE_MERGE for a test) always wins. Matching is
  * by scan relation path, so it survives projections/filters/aliases
  * stacked between the scan and the join.
  */
object BroadcastBoundedDims extends Rule[LogicalPlan] {

  private def isBoundedDimScan(plan: LogicalPlan): Boolean = {
    val leaves = plan.collectLeaves()
    // EVERY leaf, and EVERY root path of each leaf, must be a bounded dim
    // — a relation mixing one nation path with arbitrary other paths is
    // NOT bounded, and broadcasting it is exactly the OOM this rule
    // exists to prevent
    leaves.nonEmpty && leaves.forall {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.nonEmpty && fs.location.rootPaths.forall { p =>
          val n = p.getName
          graft.sources.Tables.broadcastable.exists(t => n == s"$t.parquet" || n == t)
        }
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, _, _, hint) =>
      val newLeft =
        if (hint.leftHint.isEmpty && isBoundedDimScan(left))
          Some(HintInfo(strategy = Some(BROADCAST)))
        else hint.leftHint
      val newRight =
        if (hint.rightHint.isEmpty && isBoundedDimScan(right))
          Some(HintInfo(strategy = Some(BROADCAST)))
        else hint.rightHint
      if ((newLeft eq hint.leftHint) && (newRight eq hint.rightHint)) j
      else j.copy(hint = JoinHint(newLeft, newRight))
  }
}
