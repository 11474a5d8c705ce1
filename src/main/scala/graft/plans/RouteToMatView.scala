package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Cast, Divide, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.functions.{col, max => fMax, min => fMin, sum => fSum}
import org.apache.spark.sql.types.DoubleType

/** AUTOMATIC MATERIALIZED-VIEW ROUTING (the public "transparent query
  * rewrite over materialized views" idea): an injected optimizer rule
  * that rewrites a matching aggregate over a TxLog SOURCE table to read
  * the maintained VIEW state instead — the 100 TB group-by answered
  * from the kilobyte view, with zero query changes.
  *
  * Opt-in and safe by construction:
  *  - routing considers only the views named in the session conf
  *    `spark.graft.mv.route` (comma-separated view paths);
  *  - a view serves only while FRESH — its applied-source-version
  *    marker must equal the source's LATEST version
  *    ([[graft.operators.MatView.isFresh]]); one source commit later
  *    the same query silently reads the source again (correct first,
  *    fast when possible);
  *  - only the exact maintained algebra routes: grouping by the view's
  *    keys (or a SUBSET — the rollup rewrite: the state's slots are
  *    commutative monoids, so `cnt = SUM(cnt)`, `total = SUM(total)`,
  *    `vmin = MIN(vmin)`, `vmax = MAX(vmax)` re-aggregate exactly) with
  *    aggregates drawn from COUNT(*) / SUM / MIN / MAX / AVG of the
  *    maintained value column — no DISTINCT, no FILTER clauses, no
  *    expression over the input; WHERE predicates route ONLY when they
  *    touch grouping-key columns alone (filtering source rows on key
  *    columns filters whole GROUPS, so the same predicate applies
  *    exactly on the state — the dashboard `WHERE tenant = …` shape);
  *    any predicate naming a non-key column reads the source;
  *  - every routed output must carry EXACTLY the original attribute's
  *    data type (a decimal re-widening, for example, refuses to route
  *    rather than serve a subtly different type);
  *  - join / approx-distinct / computed-key view flavors never route
  *    (their state is not this algebra).
  *
  * The rewrite preserves the aggregate's output attribute ids (each
  * replacement column is aliased under the original `exprId`), so the
  * surrounding plan — HAVING filters, projections, sorts — resolves
  * over the routed subtree untouched. Freshness and definition reads
  * are driver-side log IO, memoized for [[ttlMs]] because the
  * optimizer re-runs rules to fixpoint. */
object RouteToMatView extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.mv.route"

  private val ttlMs = 2000L
  private val cache =
    TrieMap.empty[String, (Long, Option[(String, Seq[String], String, Boolean)])]
  private val cacheJ = TrieMap.empty[String,
    (Long, Option[(String, String, Seq[String], Seq[String], String, String, Boolean)])]

  /** For tests: drop memoized freshness so a just-committed source
    * version is observed immediately. */
  private[graft] def invalidateCache(): Unit = { cache.clear(); cacheJ.clear() }

  private def descriptor(spark: SparkSession, mv: String
                        ): Option[(String, Seq[String], String, Boolean)] = {
    val now = System.currentTimeMillis()
    cache.get(mv).filter(_._1 > now).map(_._2).getOrElse {
      val d =
        try graft.operators.MatView.routeDescriptor(spark, mv)
          .map { case (src, keys, valCol) =>
            (src, keys, valCol,
              graft.operators.MatView.isFresh(spark, mv, src))
          }
        catch { case _: Exception => None } // unreadable view: never route
      cache.put(mv, (now + ttlMs, d))
      d
    }
  }

  private def joinDescriptor(spark: SparkSession, mv: String
  ): Option[(String, String, Seq[String], Seq[String], String, String, Boolean)] = {
    val now = System.currentTimeMillis()
    cacheJ.get(mv).filter(_._1 > now).map(_._2).getOrElse {
      val d =
        try graft.operators.MatView.routeJoinDescriptor(spark, mv)
          .map { case (fact, dim, joinKeys, keys, valCol, jt) =>
            (fact, dim, joinKeys, keys, valCol, jt,
              graft.operators.MatView.isFreshJoin(spark, mv, fact, dim))
          }
        catch { case _: Exception => None } // unreadable view: never route
      cacheJ.put(mv, (now + ttlMs, d))
      d
    }
  }

  /** The TxLog table path under a BARE live scan. Alias chains and
    * attribute-only projections (the optimizer's own column pruning)
    * are transparent; anything else — filters, computed projections,
    * time travel — refuses. */
  private def srcOf(p: LogicalPlan): Option[String] = p match {
    case SubqueryAlias(_, c) => srcOf(c)
    case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      srcOf(c)
    case r: DataSourceV2Relation => r.table match {
      case t: graft.sources.TxLogV2Table if t.asOf.isEmpty => Some(t.tablePath)
      case _ => None
    }
    case s: DataSourceV2ScanRelation => s.relation.table match {
      case t: graft.sources.TxLogV2Table if t.asOf.isEmpty => Some(t.tablePath)
      case _ => None
    }
    case _ => None
  }

  private sealed trait Out
  private case class KeyOut(name: String) extends Out
  private case class AggOut(op: String) extends Out // cnt|total|vmin|vmax|vavg

  /** Peel WHERE predicates off the aggregate's child (alias/pruning
    * layers transparent). A predicate over GROUPING-KEY columns only is
    * routable — filtering source rows on key columns filters whole
    * GROUPS, so the same predicate applies exactly on the view state;
    * any predicate touching a non-key column refuses downstream. */
  private def stripFilters(p: LogicalPlan): (Seq[Expression], LogicalPlan) =
    p match {
      case SubqueryAlias(_, c) => stripFilters(c)
      case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        stripFilters(c)
      case Filter(cond, c) =>
        val (fs, leaf) = stripFilters(c)
        (cond +: fs, leaf)
      case other => (Nil, other)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mvs = conf.getConfString(ConfKey, "")
      .split(',').map(_.trim).filter(_.nonEmpty)
    if (mvs.isEmpty) return plan
    val spark = SparkSession.active
    plan.transformUp {
      case agg @ Aggregate(groupings, _, child, _) if groupings.nonEmpty =>
        val (preds, leaf) = stripFilters(child)
        srcOf(leaf).flatMap { src =>
          mvs.iterator.map { mv =>
            descriptor(spark, mv) match {
              case Some((s, keys, valCol, fresh)) if s == src && fresh =>
                // a failed rewrite ATTEMPT must never fail the query —
                // refusing always falls back to the correct source scan
                try tryRewrite(spark, mv, keys, valCol, agg, preds)
                catch { case scala.util.control.NonFatal(_) => None }
              case _ => None
            }
          }.collectFirst { case Some(p) => p }
        }.orElse {
          joinRoute(spark, mvs.toSeq, leaf, agg, preds)
        }.getOrElse(agg)
    }
  }

  private def conjunctsOf(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjunctsOf(l) ++ conjunctsOf(r)
    case x => Seq(x)
  }

  /** Route `agg` over a bare fact ⋈ dim join matching a registered
    * join-MV definition: both legs live scans of the defined tables
    * (inner orientation free, LEFT fact-first), the ON exactly the
    * defined same-name key equalities, both watermarks fresh.
    * Predicates — above the join OR pushed into a leg by the optimizer
    * — route only when they reference the view's GROUPING KEYS alone:
    * every row of a group shares its key values, so a key-only
    * predicate filters whole groups identically wherever it sits, and
    * applies exactly on the state (a LEFT join's null-dim group fails
    * any non-null-safe key predicate on state and source alike — same
    * SQL three-valued logic both places). Anything else refuses and
    * reads the sources. The grouping/aggregate matching and the monoid
    * rollup are [[tryRewrite]] unchanged. */
  private def joinRoute(spark: SparkSession, mvs: Seq[String],
                        leaf: LogicalPlan, agg: Aggregate,
                        topPreds: Seq[Expression]): Option[LogicalPlan] =
    leaf match {
      case j: Join =>
        val (lPreds, fLeaf) = stripFilters(j.left)
        val (rPreds, dLeaf) = stripFilters(j.right)
        val preds = topPreds ++ lPreds ++ rPreds
        val jt = j.joinType match {
          case Inner => "inner"
          case LeftOuter => "left"
          case _ => return None
        }
        // a LEFT join's left-leg filter commutes (fact-preserving), but
        // a filter UNDER its dim leg is not the same query as one above
        // the join (it null-extends instead of dropping) — refuse
        if (jt == "left" && rPreds.nonEmpty) return None
        val onNames: Seq[String] = j.condition.map(conjunctsOf).getOrElse(Nil)
          .map {
            case EqualTo(a: AttributeReference, b: AttributeReference)
              if a.name == b.name => a.name
            case _ => return None
          }
        if (onNames.isEmpty || onNames.distinct.size != onNames.size)
          return None
        (srcOf(fLeaf), srcOf(dLeaf)) match {
          case (Some(left), Some(right)) =>
            mvs.iterator.map { mv =>
              joinDescriptor(spark, mv) match {
                case Some((fact, dim, joinKeys, keys, valCol, vjt, fresh))
                  if fresh && vjt == jt && onNames.toSet == joinKeys.toSet &&
                    ((left == fact && right == dim) ||
                      // inner is symmetric; LEFT needs the fact on the left
                      (jt == "inner" && left == dim && right == fact)) =>
                  try tryRewrite(spark, mv, keys, valCol, agg, preds)
                  catch { case scala.util.control.NonFatal(_) => None }
                case _ => None
              }
            }.collectFirst { case Some(p) => p }
          case _ => None
        }
      case _ => None
    }

  private def tryRewrite(spark: SparkSession, mv: String, keys: Seq[String],
                         valCol: String, agg: Aggregate,
                         preds: Seq[Expression]): Option[LogicalPlan] = {
    // WHERE predicates route only when they touch grouping keys alone
    // (then they filter whole groups — exact on the state); rendering
    // back to SQL re-resolves them against the state's columns by name
    if (!preds.forall(_.references.forall(a => keys.contains(a.name))))
      return None
    val predSql: Seq[String] =
      try preds.map(_.transform {
        // strip qualifiers: the rendered SQL re-resolves by bare name
        // against the state's columns
        case a: AttributeReference => a.withQualifier(Seq.empty)
      }.sql)
      catch { case _: Exception => return None } // unrenderable: refuse
    // grouping: bare attributes, unique, drawn from the view's keys
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference => a.name
      case _ => return None
    }
    if (groupNames.distinct.size != groupNames.size) return None
    if (!groupNames.forall(keys.contains)) return None
    val exact = groupNames.toSet == keys.toSet

    def attrName(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    val outs: Seq[Out] = agg.aggregateExpressions.map {
      case a: AttributeReference if groupNames.contains(a.name) => KeyOut(a.name)
      case Alias(inner, _) => inner match {
        case a: AttributeReference if groupNames.contains(a.name) =>
          KeyOut(a.name)
        case ae: AggregateExpression
          if !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case c: Count if c.children.nonEmpty && c.children.forall {
              // COUNT(*) resolves to COUNT(1); COUNT(NULL) is always 0
              // and COUNT(col) skips nulls — neither is the state's cnt
              case Literal(v, _) => v != null
              case _ => false
            } => AggOut("cnt")
            case s: Sum if attrName(s.child).contains(valCol) =>
              AggOut("total")
            case m: Min if attrName(m.child).contains(valCol) =>
              AggOut("vmin")
            case m: Max if attrName(m.child).contains(valCol) =>
              AggOut("vmax")
            case a: Average if attrName(a.child).contains(valCol) =>
              AggOut("vavg")
            case _ => return None
          }
        case _ => return None
      }
      case _ => return None
    }

    // the state-side frame: key-only WHERE predicates first (they
    // filter whole groups), then the raw view for an exact key match or
    // the monoid re-aggregation for a rollup over a key subset
    val state: DataFrame = predSql.foldLeft(
      graft.sources.TxLog.read(spark, mv))(
      (df, p) => df.filter(org.apache.spark.sql.functions.expr(p)))
    val served: DataFrame =
      if (exact) state
      else state.groupBy(groupNames.map(col): _*).agg(
        fSum(col("cnt")).as("cnt"), fSum(col("total")).as("total"),
        fMin(col("vmin")).as("vmin"), fMax(col("vmax")).as("vmax"))
    val analyzed = served.queryExecution.analyzed
    val byName = analyzed.output.map(a => a.name -> a).toMap
    def slot(op: String): Expression = op match {
      case "vavg" => Divide(Cast(byName("total"), DoubleType),
        Cast(byName("cnt"), DoubleType))
      case "cnt" => byName("cnt")
      case "total" => byName("total")
      case "vmin" => byName("vmin")
      case "vmax" => byName("vmax")
    }
    val projectList = agg.output.zip(outs).map { case (outAttr, o) =>
      val e = o match {
        case KeyOut(n) => byName(n)
        case AggOut(op) => slot(op)
      }
      // refuse to route across ANY type drift (e.g. decimal re-widening
      // under the rollup's sum-of-sums) — falling back to the source is
      // always correct; serving a different type never is
      if (e.dataType != outAttr.dataType) return None
      Alias(e, outAttr.name)(exprId = outAttr.exprId)
    }
    Some(Project(projectList, analyzed))
  }
}
