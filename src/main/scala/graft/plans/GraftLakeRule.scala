package graft.plans

import graft.operators.MergeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, EqualTo, Expression, Not}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.GraftMergeIntoCommand

/** Resolution rule that gives the [[GraftCatalog]] lake its SQL
  * semantics (injected by [[GraftExtensions]]):
  *
  *  1. READS: `DataSourceV2Relation(GraftLakeTable)` is swapped for the
  *     snapshot's NATIVE parquet plan (current or `VERSION AS OF`-
  *     pinned), attribute ids preserved via an aliasing Project — so
  *     lake scans get file-source pushdown, vectorized reads, and
  *     whole-stage codegen instead of a hand-rolled row reader. This is
  *     the Delta-style architecture: the catalog resolves identity, a
  *     rule supplies the plan.
  *  2. MERGE: `MergeIntoTable` targeting a lake table is rewritten to
  *     [[GraftMergeIntoCommand]] (runs [[MergeTable.merge]] through the
  *     real commit protocol). The supported SQL shapes map exactly onto
  *     the engine's merge contract:
  *
  *     {{{
  *       ON t.k = s.k
  *       WHEN MATCHED THEN UPDATE SET *
  *       WHEN NOT MATCHED THEN INSERT *
  *     }}}
  *
  *     plus the CDC form with a leading `WHEN MATCHED AND s.<flag> THEN
  *     DELETE` (the flag becomes `deleteCol`: flagged matches delete,
  *     flagged non-matches are ignored, per the engine contract; an
  *     optional `AND NOT s.<flag>` on the INSERT is accepted as the
  *     explicit spelling of that contract). Any other shape fails loudly
  *     — partial-column assignments have no MergeTable equivalent and
  *     silently approximating them would corrupt tables.
  */
case class GraftLakeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Phase 1: merges first — the rewrite consumes the target relation,
    // which must therefore still be a catalog relation, not an already-
    // swapped parquet plan.
    val afterMerge = plan.transformDown {
      // fire only when the WHOLE merge is ready: a half-resolved
      // condition/action (possible mid-fixed-point) must defer to the
      // next analyzer round, not throw unsupported on a valid shape
      case m: MergeIntoTable if m.sourceTable.resolved &&
          m.mergeCondition.resolved &&
          (m.matchedActions ++ m.notMatchedActions ++
            m.notMatchedBySourceActions).forall(actionReady) &&
          lakeTarget(m.targetTable).isDefined =>
        rewriteMerge(m, lakeTarget(m.targetTable).get)
    }
    // Phase 2: protect any merge target whose rewrite is still pending
    // (source not yet resolved this fixed-point round), swap every other
    // lake relation for its snapshot plan.
    val pendingTargets = afterMerge.collect {
      case m: MergeIntoTable => lakeRelation(m.targetTable)
    }.flatten.map(r => r: AnyRef).toSet
    afterMerge.transformDown {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftLakeTable] &&
          !pendingTargets.contains(r) =>
        val t = r.table.asInstanceOf[GraftLakeTable]
        val snap = MergeTable.snapshot(spark, t.root, t.asOf)
          .queryExecution.analyzed
        val byName = snap.output.map(a => a.name -> a).toMap
        // keep the relation's attribute ids so references above resolve
        Project(r.output.map(out =>
          Alias(byName(out.name), out.name)(exprId = out.exprId)), snap)
    }
  }

  /** The lake relation under the target's aliases, if any. */
  private def lakeRelation(target: LogicalPlan): Option[DataSourceV2Relation] =
    target match {
      case SubqueryAlias(_, child) => lakeRelation(child)
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftLakeTable] => Some(r)
      case _ => None
    }

  private def lakeTarget(target: LogicalPlan): Option[GraftLakeTable] =
    lakeRelation(target).map(_.table.asInstanceOf[GraftLakeTable])

  private def unsupported(m: MergeIntoTable, why: String): Nothing =
    throw new UnsupportedOperationException(
      s"MERGE INTO on a graft lake table supports exactly " +
        "'ON t.k = s.k [WHEN MATCHED AND s.flag THEN DELETE] " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED [AND NOT s.flag] THEN INSERT *' — " +
        s"$why (got: matched=${m.matchedActions}, " +
        s"notMatched=${m.notMatchedActions}, " +
        s"notMatchedBySource=${m.notMatchedBySourceActions})")

  /** A merge action is rewrite-ready when it is a star action (stars
    * are unresolved by definition until expansion — the rewrite handles
    * both forms) or fully resolved. */
  private def actionReady(a: Expression): Boolean = a match {
    case _: UpdateStarAction | _: InsertStarAction => true
    case other => other.resolved
  }

  private def rewriteMerge(m: MergeIntoTable, table: GraftLakeTable): LogicalPlan = {
    if (table.asOf.isDefined)
      throw new UnsupportedOperationException(
        "MERGE INTO a time-travelled snapshot is not a thing: the target " +
          "must be the table's current version")
    // the equality key: ON t.k = s.k with the SAME column name on both
    // sides (the engine merges by one named key column)
    val key = m.mergeCondition match {
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if l.name == r.name => l.name
      case other => unsupported(m,
        s"the merge condition must be a single same-name key equality, got $other")
    }
    // a delete flag must be a bare boolean attribute of the SOURCE —
    // engine semantics key off the batch column, so a target-side or
    // computed predicate has no faithful mapping
    def flagOf(cond: Expression): String = cond match {
      case a: AttributeReference
          if m.sourceTable.outputSet.contains(a) => a.name
      case other => unsupported(m,
        s"a DELETE condition must be a bare source boolean column, got $other")
    }
    // `SET *` / `INSERT *` arrive either pre-expansion (UpdateStarAction
    // /InsertStarAction) or — when Spark's own assignment resolution ran
    // first in the fixed point — expanded to per-column assignments.
    // The expanded form is faithful exactly when every assignment is
    // `t.col = s.col` by NAME and every target column is covered; any
    // partial or computed assignment has no MergeTable equivalent.
    val targetCols = lakeRelation(m.targetTable).get.output.map(_.name).toSet
    def isStar(assigns: Seq[Assignment]): Boolean =
      assigns.forall {
        case Assignment(k: AttributeReference, v: AttributeReference) =>
          k.name == v.name
        // Spark's assignment alignment may wrap a same-name source
        // column in an IDENTITY cast; a type-CHANGING cast stays
        // unsupported (the engine writes source values verbatim, so
        // approximating it would corrupt the table)
        case Assignment(k: AttributeReference, Cast(v: AttributeReference, dt, _, _)) =>
          k.name == v.name && dt == v.dataType
        case _ => false
      } && assigns.map { case Assignment(k: AttributeReference, _) => k.name }
        .toSet == targetCols
    val deleteCol: Option[String] = m.matchedActions match {
      case Seq(UpdateStarAction(None)) => None
      case Seq(UpdateAction(None, assigns, _)) if isStar(assigns) => None
      case Seq(DeleteAction(Some(cond)), UpdateStarAction(None)) => Some(flagOf(cond))
      case Seq(DeleteAction(Some(cond)), UpdateAction(None, assigns, _))
          if isStar(assigns) => Some(flagOf(cond))
      case other => unsupported(m, s"unsupported WHEN MATCHED actions $other")
    }
    m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => ()
      case Seq(InsertAction(None, assigns)) if isStar(assigns) => ()
      // the explicit spelling of the engine's flagged-non-match-ignored
      // contract — accepted only when it names the SAME flag
      case Seq(InsertStarAction(Some(Not(cond))))
          if deleteCol.contains(flagOf(cond)) => ()
      case Seq(InsertAction(Some(Not(cond)), assigns))
          if isStar(assigns) && deleteCol.contains(flagOf(cond)) => ()
      case other => unsupported(m, s"unsupported WHEN NOT MATCHED actions $other")
    }
    if (m.notMatchedBySourceActions.nonEmpty)
      unsupported(m, "WHEN NOT MATCHED BY SOURCE has no engine equivalent")
    GraftMergeIntoCommand(table.root, key, deleteCol, m.sourceTable)
  }
}
