package graft.plans

import org.apache.spark.sql.{GraftSqlShims, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction,
  InsertAction, LogicalPlan, MergeIntoTable, Project, SubqueryAlias,
  UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.{MergeMatchedClause, MergeMatchedDelete,
  MergeMatchedUpdate, MergeNotMatchedInsert, TxLog, TxLogV2Table}

/** SQL `UPDATE` and `MERGE INTO` for TxLog tables — a post-hoc
  * resolution rule (the public Delta wiring) that intercepts the
  * analyzed [[UpdateTable]]/[[MergeIntoTable]] plans targeting a
  * [[TxLogV2Table]] and replaces them with runnable commands that land
  * the SAME merge-on-read commits the library API produces:
  *
  *  - `UPDATE graft.`/t` SET c = expr [WHERE p]` →
  *    [[TxLog.updateMorExpr]] — superseded positions into a deletion
  *    vector + post-assignment images appended, ONE "merge" commit,
  *    zero files rewritten;
  *  - `MERGE INTO graft.`/t` t USING src s ON t.k = s.k
  *    WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` →
  *    [[TxLog.mergeMor]] — the canonical upsert;
  *  - `... WHEN MATCHED THEN DELETE` (sole action) →
  *    [[TxLog.deleteKeysMor]] — erase-by-id-list, broadcast semi-join;
  *  - every other well-formed clause algebra — `WHEN MATCHED AND cond
  *    THEN UPDATE SET c = expr` (partial columns), conditional DELETE,
  *    multiple matched clauses, conditional/partial INSERT, and
  *    `WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE/DELETE` —
  *    → [[TxLog.mergeMorConditional]], first-true-wins per clause
  *    list, ONE merge-on-read commit.
  *
  * A NON-EQUI ON is supported (r15): same-name target=source
  * equalities become the pair join's hash keys and every other
  * deterministic conjunct — range bounds, point-in-interval,
  * differently-named equalities — rides to
  * [[TxLog.mergeMorConditional]] as its `residual` (the non-equi
  * filter of that same broadcast hash join). A PURE-theta ON (r16: no
  * equi key at all, residual only) lowers to a broadcast NESTED-LOOP
  * join — the target still streams once against the broadcast source,
  * per-row cost |src| residual evaluations, the honest
  * bounded-build-side plan for an interval/theta merge.
  *
  * `MERGE WITH SCHEMA EVOLUTION` (r15) is supported for the canonical
  * upsert: the source's extra columns append to the image and
  * [[TxLog.mergeMor]]'s `evolve` lands the widened/extended declared
  * schema INSIDE the merge commit (old files read added columns null /
  * widened types promoted; time travel reads each version's own
  * schema). What still fails LOUDLY (with a pointer at the right API —
  * never a silently different semantic): an ON with NEITHER an equi
  * key nor a residual (a cross join) and WITH SCHEMA EVOLUTION beyond
  * the canonical upsert (evolve via ALTER TABLE first).
  * Resolved expressions are re-rendered as SQL (qualifiers stripped;
  * source columns namespaced `_src_<name>` on the conditional path) so
  * the library entry points bind them against the scan exactly as a
  * user-written predicate. */
object TxLogDml extends Rule[LogicalPlan] {

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"txlog: $what — use the TxLog library API " +
        "(updateMorExpr/mergeMor/deleteKeysMor) for shapes SQL cannot " +
        "express through this rule")

  /** The TxLog table under the target relation, if any. */
  private def txTable(plan: LogicalPlan): Option[TxLogV2Table] = plan match {
    case SubqueryAlias(_, child) => txTable(child)
    case r: DataSourceV2Relation => r.table match {
      case t: TxLogV2Table => Some(t)
      case _ => None
    }
    case _ => None
  }

  private def requireLive(t: TxLogV2Table): String = {
    t.asOf.foreach(v => unsupported(
      s"cannot write to ${t.tablePath} VERSION AS OF $v (snapshots are immutable)"))
    t.tablePath
  }

  /** Resolved expression → SQL text binding by bare column name. */
  private def sqlOf(e: Expression): String =
    e.transform {
      case a: AttributeReference => a.withQualifier(Seq.empty)
    }.sql

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u @ UpdateTable(target, assignments, condition)
          if u.resolved && txTable(target).isDefined =>
        val table = requireLive(txTable(target).get)
        val sets = assignments.map { a =>
          a.key match {
            case k: AttributeReference => k.name -> sqlOf(a.value)
            case k => unsupported(s"UPDATE of a non-column target ${k.sql}")
          }
        }
        TxLogUpdateCommand(table, sets,
          condition.map(sqlOf).getOrElse("true"))

      case m @ MergeIntoTable(target, source, cond, matched, notMatched,
          bySource, withSchemaEvolution) if m.resolved &&
          txTable(target).isDefined =>
        val table = requireLive(txTable(target).get)
        val sourceOut = source.outputSet
        val targetOut = target.outputSet

        /** Resolved expression → SQL over the conditional-merge
          * namespace: target columns bare, source columns `_src_<name>`
          * ([[TxLog.mergeMorConditional]]'s binding contract). */
        def sqlOfNs(e: Expression): String =
          e.transform {
            case a: AttributeReference if sourceOut.contains(a) =>
              a.withName(s"_src_${a.name}").withQualifier(Seq.empty)
            case a: AttributeReference if targetOut.contains(a) =>
              a.withQualifier(Seq.empty)
          }.sql

        // ON = same-name target=source equalities (the hash keys the
        // pair join builds on) + any RESIDUAL conjuncts — inequalities,
        // BETWEENs, differently-named equalities — which ride to
        // [[TxLog.mergeMorConditional]] as the non-equi filter of that
        // same hash join (r15: the range / point-in-interval merge).
        // r16: a PURE-theta ON (no equi key, residual only) is accepted
        // too — it lowers to a broadcast nested-loop join in which the
        // target still streams ONCE against the broadcast source
        // (per-row cost |src| residual evaluations — the honest
        // bounded-build-side plan); only an ON with NEITHER keys nor
        // residual (a cross join) stays rejected.
        val keyB = Seq.newBuilder[(String, Expression)]
        val resB = Seq.newBuilder[Expression]
        splitConjuncts(cond).foreach {
          case EqualTo(l: AttributeReference, r: AttributeReference)
              if targetOut.contains(l) && sourceOut.contains(r) &&
                l.name.equalsIgnoreCase(r.name) =>
            keyB += (l.name -> (r: Expression))
          case EqualTo(l: AttributeReference, r: AttributeReference)
              if targetOut.contains(r) && sourceOut.contains(l) &&
                r.name.equalsIgnoreCase(l.name) =>
            keyB += (r.name -> (l: Expression))
          case other if other.deterministic => resB += other
          case other => unsupported(
            s"MERGE ON carries a nondeterministic term (${other.sql})")
        }
        val keys: Seq[(String, Expression)] = keyB.result()
        val residualConjs = resB.result()
        if (keys.isEmpty && residualConjs.isEmpty) unsupported(
          "MERGE ON names neither a same-name target=source key equality " +
            "nor a residual condition — that ON is a cross join")
        val residual: Option[String] =
          if (residualConjs.isEmpty) None
          else Some(residualConjs.map(c => s"(${sqlOfNs(c)})").mkString(" AND "))

        /** The canonical-upsert fast path's one-image-per-key plan, iff
          * the shape is EXACTLY `WHEN MATCHED THEN UPDATE SET * WHEN NOT
          * MATCHED THEN INSERT *` with agreeing, full-coverage,
          * key-consistent images — [[TxLog.mergeMor]]'s contract. Any
          * other well-formed shape returns None and takes the generic
          * conditional path below. */
        def canonicalUpsert(up: UpdateAction,
                            ins: InsertAction): Option[LogicalPlan] = {
          if (up.condition.nonEmpty || ins.condition.nonEmpty) return None
          val insByCol = imageByColumn(ins.assignments)
          val upByCol = imageByColumn(up.assignments)
          val targetCols = target.output.map(_.name)
          val fits =
            insByCol.keySet == targetCols.toSet &&
              upByCol.keySet == targetCols.toSet &&
              targetCols.forall(c =>
                upByCol(c).canonicalized == insByCol(c).canonicalized) &&
              // the ON key's source expr must be the image's key column,
              // or matching and inserting would use different values
              keys.forall { case (k, srcExpr) =>
                insByCol(k).canonicalized == srcExpr.canonicalized }
          if (!fits) None
          else Some(Project(
            target.output.map(a => Alias(insByCol(a.name), a.name)()),
            source))
        }

        def assignsOf(as: Seq[Assignment]): Seq[(String, String)] =
          as.map { a =>
            a.key match {
              case k: AttributeReference => k.name -> sqlOfNs(a.value)
              case k => unsupported(s"MERGE assigns a non-column target ${k.sql}")
            }
          }

        (matched, notMatched, bySource) match {
          // canonical upsert: UPDATE-all + INSERT-all with agreeing images
          // (pure-equi ON only — a residual ON needs per-row match
          // classification, which is the conditional path's job)
          case (Seq(up: UpdateAction), Seq(ins: InsertAction), Seq())
              if residual.isEmpty && canonicalUpsert(up, ins).isDefined =>
            // WITH SCHEMA EVOLUTION (r15): the analyzer's star expansion
            // covers the target's columns only, so the source's EXTRA
            // columns are appended to the image here and the command
            // evolves the declared schema atomically with the merge
            // commit ([[TxLog.mergeMor]]'s `evolve` — add-column with
            // null backfill on old files, numeric widening; anything
            // incompatible fails loudly before any write)
            val image0 = canonicalUpsert(up, ins).get
            val image =
              if (!withSchemaEvolution) image0
              else {
                val tgtNames = target.output.map(_.name.toLowerCase).toSet
                val extra = source.output
                  .filterNot(a => tgtNames.contains(a.name.toLowerCase))
                image0 match {
                  case Project(list, child) =>
                    // the analyzer's star expansion CASTS each source
                    // column down to the target's declared type — under
                    // evolution the source's OWN (possibly wider) type
                    // must reach the image, so casts directly over a
                    // source attribute are unwrapped (mergeMor's
                    // evolveSchema then widens the declaration; an ANSI
                    // down-cast here would overflow instead of evolve)
                    val unwrapped = list.map {
                      case al @ Alias(
                        c: org.apache.spark.sql.catalyst.expressions.Cast,
                        name) => c.child match {
                          case a: AttributeReference if sourceOut.contains(a) =>
                            Alias(a, name)()
                          case _ => al
                        }
                      case other => other
                    }
                    Project(unwrapped ++ extra.map(a => Alias(a, a.name)()),
                      child)
                  case other => other
                }
              }
            TxLogMergeCommand(table, image, keys.map(_._1), delete = false,
              evolve = withSchemaEvolution)
          // erase-by-key: a sole unconditional MATCHED DELETE
          case (Seq(del: DeleteAction), Seq(), Seq())
              if residual.isEmpty && del.condition.isEmpty =>
            val image = Project(keys.map { case (k, srcExpr) =>
              Alias(srcExpr, k)() }, source)
            TxLogMergeCommand(table, image, keys.map(_._1), delete = true)
          // everything else well-formed: the generic conditional merge —
          // WHEN MATCHED [AND c] THEN UPDATE SET col = expr… / DELETE,
          // WHEN NOT MATCHED [AND c] THEN INSERT, WHEN NOT MATCHED BY
          // SOURCE [AND c] THEN UPDATE/DELETE — first-true-wins per list
          case _ if withSchemaEvolution => unsupported(
            "MERGE WITH SCHEMA EVOLUTION beyond the canonical upsert " +
              "(UPDATE SET * + INSERT * on a pure-equi ON) — evolve via " +
              "ALTER TABLE ADD COLUMN / TxLog.appendEvolve first, then " +
              "run the conditional merge against the evolved schema")
          case _ =>
            def updateOrDelete(actions: Seq[
              org.apache.spark.sql.catalyst.plans.logical.MergeAction],
                               what: String): Seq[MergeMatchedClause] =
              actions.map {
                case u: UpdateAction =>
                  MergeMatchedUpdate(u.condition.map(sqlOfNs),
                    assignsOf(u.assignments))
                case d: DeleteAction =>
                  MergeMatchedDelete(d.condition.map(sqlOfNs))
                case other => unsupported(
                  s"MERGE $what action ${other.getClass.getSimpleName}")
              }
            val nmClauses = notMatched.map {
              case i: InsertAction =>
                MergeNotMatchedInsert(i.condition.map(sqlOfNs),
                  assignsOf(i.assignments))
              case other => unsupported(
                s"MERGE not-matched action ${other.getClass.getSimpleName}")
            }
            TxLogMergeCondCommand(table, source, keys.map(_._1),
              updateOrDelete(matched, "matched"), nmClauses,
              updateOrDelete(bySource, "not-matched-by-source"), residual)
        }
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def imageByColumn(as: Seq[Assignment]): Map[String, Expression] =
    as.map { a =>
      a.key match {
        case k: AttributeReference => k.name -> a.value
        case k => unsupported(s"MERGE assigns a non-column target ${k.sql}")
      }
    }.toMap
}

/** `UPDATE graft.`/t`` as one merge-on-read commit. */
case class TxLogUpdateCommand(table: String, sets: Seq[(String, String)],
                              predicate: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    TxLog.updateMorExpr(spark, table, predicate, sets)
    Seq.empty
  }
}

/** `MERGE INTO graft.`/t`` as one merge-on-read commit: upsert
  * ([[TxLog.mergeMor]]) or erase-by-key ([[TxLog.deleteKeysMor]]).
  * The source image plan rides as a FIELD (already analyzer-resolved;
  * executed via the ofRows shim at run time). */
case class TxLogMergeCommand(table: String, image: LogicalPlan,
                             keys: Seq[String], delete: Boolean,
                             evolve: Boolean = false)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftSqlShims.ofRows(spark, image)
    if (delete) TxLog.deleteKeysMor(spark, table, src, keys)
    else TxLog.mergeMor(spark, table, src, keys, evolve = evolve)
    Seq.empty
  }
}

/** Generic conditional `MERGE INTO graft.`/t`` — one
  * [[TxLog.mergeMorConditional]] commit. The analyzer-resolved source
  * plan rides as a field; clause conditions/assignments ride as SQL in
  * the merge namespace (target bare, source `_src_<name>`). */
case class TxLogMergeCondCommand(table: String, source: LogicalPlan,
                                 keys: Seq[String],
                                 matched: Seq[MergeMatchedClause],
                                 notMatched: Seq[MergeNotMatchedInsert],
                                 bySource: Seq[MergeMatchedClause] = Seq.empty,
                                 residual: Option[String] = None)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    TxLog.mergeMorConditional(spark, table,
      GraftSqlShims.ofRows(spark, source), keys, matched, notMatched,
      bySource, residual)
    Seq.empty
  }
}
