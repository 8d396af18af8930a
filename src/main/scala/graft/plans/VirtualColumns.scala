package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, SubqueryAlias, UnresolvedWith}
import org.apache.spark.sql.catalyst.rules.Rule

/** The reference's virtual columns (ref ql/metadata/VirtualColumn.java),
  * resolved as RESERVED names pre-analysis:
  *
  *   - `INPUT__FILE__NAME` → `input_file_name()` (row provenance — the
  *     debugging column every warehouse user reaches for);
  *   - `GROUPING__ID` → `grouping_id()` (the standard bit-vector id the
  *     reference emits since HIVE-16102 aligned it with the spec — the
  *     same integer Spark's `grouping_id()` computes).
  *
  * Reserved means reserved: like the reference, a real column spelled
  * `input__file__name` is shadowed by the virtual column. The offsets
  * family (`BLOCK__OFFSET__INSIDE__FILE`, `ROW__OFFSET__INSIDE__BLOCK`)
  * depends on the reader exposing byte positions, which Spark's columnar
  * scan does not — those names stay unresolved and surface Spark's
  * canonical error. `ROW__ID` lives on the ACID surface
  * ([[graft.sources.AcidOrc.readWithIds]]).
  */
object VirtualColumns {

  private val mapping: Map[String, String] = Map(
    "input__file__name" -> "input_file_name",
    "grouping__id" -> "grouping_id")

  private def virtualOf(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute if a.nameParts.size == 1 =>
      mapping.get(a.nameParts.head.toLowerCase)
    case _ => None
  }

  /** A BARE `SELECT GROUPING__ID` item is a NamedExpression slot — the
    * substituted function needs an Alias carrying the original spelling
    * (replacing it raw would CCE inside Project's typed projectList).
    */
  private def fixNamed(ne: NamedExpression): NamedExpression = ne match {
    case a: UnresolvedAttribute if virtualOf(a).isDefined =>
      Alias(UnresolvedFunction(Seq(virtualOf(a).get), Nil,
        isDistinct = false), a.nameParts.head)()
    case other => other
  }

  private def rewriteExprs(p: LogicalPlan,
      go: LogicalPlan => LogicalPlan): LogicalPlan = {
    val named = p match {
      case proj: Project =>
        proj.copy(projectList = proj.projectList.map(fixNamed))
      case agg: Aggregate =>
        agg.copy(aggregateExpressions =
          agg.aggregateExpressions.map(fixNamed))
      case other => other
    }
    named.transformExpressions {
      case e if virtualOf(e).isDefined =>
        UnresolvedFunction(Seq(virtualOf(e).get), Nil, isDistinct = false)
      case sq: SubqueryExpression => sq.withNewPlan(go(sq.plan))
    }
  }

  /** Pre-analysis substitution for the [[graft.Engine.sql]] front door —
    * descends into CTE definitions (innerChildren, invisible to stock
    * traversals) and subquery expressions. Gated by a cheap text probe so
    * the traversal only runs when a virtual name can occur.
    */
  def maybeSubstitute(plan: LogicalPlan, queryText: String): LogicalPlan = {
    val up = queryText.toUpperCase
    if (!mapping.keys.exists(k => up.contains(k.toUpperCase))) return plan
    def go(p: LogicalPlan): LogicalPlan = p match {
      case w: UnresolvedWith =>
        rewriteExprs(w.copy(
          child = go(w.child),
          cteRelations = w.cteRelations.map { case (n, d, cols) =>
            (n, go(d).asInstanceOf[SubqueryAlias], cols)
          }), go)
      case other => rewriteExprs(other.mapChildren(go), go)
    }
    go(plan)
  }

  /** Analyzer-injected form for extensions-bootstrapped sessions (the
    * analyzer has already lifted CTE definitions by the time resolution
    * rules iterate, so the stock traversal suffices here).
    */
  class ResolveVirtualColumns(session: SparkSession)
      extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.resolveOperatorsUp { case p => rewriteExprs(p, identity) }
  }
}
