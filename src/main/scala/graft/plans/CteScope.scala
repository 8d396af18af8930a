package graft.plans

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, UnresolvedWith}

/** Scope-aware traversal over PARSED (pre-analysis) plans, carrying the set
  * of CTE names visible at each node — the same positional visibility the
  * analyzer's CTESubstitution applies (ref ql/.../parse/SemanticAnalyzer
  * .java resolves CTE names the same way before metastore lookup): a name
  * is visible in the `UnresolvedWith`'s main child and in LATER sibling
  * definitions; a recursive WITH additionally sees itself inside its own
  * definition.
  *
  * Two things the stock `transformDownWithSubqueries` /
  * `foreachWithSubqueries` get wrong for pre-analysis relation rewriting:
  *
  *   1. `UnresolvedWith.cteRelations` are NOT children of the node (they
  *      are `innerChildren`), so a plain traversal never visits relation
  *      references inside CTE definitions — `WITH x AS (SELECT * FROM t)`
  *      would leave `t` unseen (unchecked by [[Authz]], unsubstituted by
  *      [[NamedTables]]).
  *   2. There is no scoping: a CTE named like a real table must shadow it
  *      exactly where the CTE is visible — nowhere else. A flat name set
  *      either over-exempts (a nested CTE exempting an outer reference) or
  *      under-shadows (a registered name substituted over its CTE alias).
  *
  * Shared by [[Authz]] (privilege checks + policy rewrite) and
  * [[NamedTables]] (pre-analysis name substitution).
  */
private[plans] object CteScope {

  private def norm(s: String): String = s.toLowerCase(Locale.ROOT)

  /** True when `parts` is a single-part name that a CTE in scope shadows:
    * such a reference resolves to its defining subquery, never to a
    * catalog table.
    */
  def shadowed(parts: Seq[String], scope: Set[String]): Boolean =
    parts.size == 1 && scope.contains(norm(parts.head))

  /** Visit every node (including CTE definitions and subquery-expression
    * plans) with the CTE names in scope at that node.
    */
  def walk(plan: LogicalPlan, scope: Set[String] = Set.empty)(
      f: (LogicalPlan, Set[String]) => Unit): Unit = plan match {
    case w: UnresolvedWith =>
      f(w, scope)
      var s = scope
      w.cteRelations.foreach { case (n, defPlan, _) =>
        walk(defPlan, if (w.allowRecursion) s + norm(n) else s)(f)
        s += norm(n)
      }
      walk(w.child, s)(f)
    case other =>
      f(other, scope)
      other.children.foreach(walk(_, scope)(f))
      other.expressions.foreach(_.foreach {
        case sq: SubqueryExpression => walk(sq.plan, scope)(f)
        case _ => ()
      })
  }

  /** The transform twin of [[walk]]: top-down, carrying scope, and
    * rebuilding `UnresolvedWith` definitions (which `transformDown` cannot
    * reach — they are not children). A node the rule rewrites is NOT
    * descended into: rewrites are terminal, so a substituted read can
    * never be re-wrapped.
    */
  def transform(plan: LogicalPlan, scope: Set[String] = Set.empty)(
      rule: (LogicalPlan, Set[String]) => Option[LogicalPlan]): LogicalPlan =
    rule(plan, scope).getOrElse(plan match {
      case w: UnresolvedWith =>
        var s = scope
        val newRels = w.cteRelations.map { case (n, defPlan, cols) =>
          val defScope = if (w.allowRecursion) s + norm(n) else s
          val newDef = transform(defPlan, defScope)(rule)
          s += norm(n)
          // rules only rewrite relation/TVF nodes, so the SubqueryAlias
          // wrapper survives the transform unchanged
          (n, newDef.asInstanceOf[SubqueryAlias], cols)
        }
        w.copy(child = transform(w.child, s)(rule), cteRelations = newRels)
      case other =>
        other.mapChildren(transform(_, scope)(rule)).transformExpressions {
          case sq: SubqueryExpression =>
            sq.withNewPlan(transform(sq.plan, scope)(rule))
        }
    })
}
