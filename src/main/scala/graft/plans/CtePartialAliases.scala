package graft.plans

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, UnresolvedWith}

/** Hive permits a PARTIAL column-alias list on a WITH definition —
  * `WITH cte1(a) AS (SELECT int_col x, bigint_col y FROM t)` aliases the
  * first column and keeps the remainder's own names (`a`, `y`); a kept
  * name that collides with an assigned alias degrades to `_col<i>`
  * (ref ql/parse/SemanticAnalyzer.java CTE alias handling; pinned by
  * cte_8.q.out: `cte1(a)` over `(x, a)` answers columns `a, _col1`).
  * Spark's ResolveSubqueryColumnAliases demands an exact-arity list and
  * fails the statement.
  *
  * Front-door rewrite (Engine.sql, after CteForwardRefs put definitions
  * in dependency order): each under-length alias list pads with the
  * definition's own output names — discovered by ANALYZING the
  * definition (with earlier definitions substituted in, so chained CTEs
  * resolve), never by executing it. Conservative: the plan is returned
  * untouched (same instance) unless the root is the only UnresolvedWith,
  * names are distinct, nothing is recursive, and the definition analyzes
  * cleanly — any doubt leaves Spark's canonical error to surface.
  */
object CtePartialAliases {

  private def norm(s: String): String = s.toLowerCase(Locale.ROOT)

  def apply(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan match {
      case w: UnresolvedWith if eligible(w) &&
          w.cteRelations.exists(r => partialOf(r._2).isDefined) =>
        try rewrite(spark, w)
        catch { case scala.util.control.NonFatal(_) => plan }
      case _ => plan
    }

  /** The definition's UnresolvedSubqueryColumnAliases, when present
    * (parse shape: SubqueryAlias(name, UnresolvedSubqueryColumnAliases)).
    */
  private def partialOf(defPlan: SubqueryAlias)
      : Option[UnresolvedSubqueryColumnAliases] = defPlan.child match {
    case u: UnresolvedSubqueryColumnAliases => Some(u)
    case _ => None
  }

  private def eligible(w: UnresolvedWith): Boolean = {
    val names = w.cteRelations.map(r => norm(r._1))
    names.distinct.size == names.size &&
      !w.allowRecursion && !w.cteRelations.exists(_._3.isDefined) &&
      !(w.child +: w.cteRelations.map(_._2: LogicalPlan)).exists(
        _.collectWithSubqueries { case _: UnresolvedWith => () }.nonEmpty)
  }

  private def subst(p: LogicalPlan,
      map: Map[String, LogicalPlan]): LogicalPlan = p transformDown {
    case r: UnresolvedRelation if r.multipartIdentifier.size == 1 &&
        map.contains(norm(r.multipartIdentifier.head)) =>
      SubqueryAlias(r.multipartIdentifier.head,
        map(norm(r.multipartIdentifier.head)))
  }

  private def rewrite(spark: SparkSession, w: UnresolvedWith): LogicalPlan = {
    // earlier definitions (in CteForwardRefs' dependency order) feed the
    // analysis of later ones
    val seen = scala.collection.mutable.Map[String, LogicalPlan]()
    var changed = false
    val fixed = w.cteRelations.map { case (name, defPlan, opt) =>
      val newDef = partialOf(defPlan) match {
        case Some(u) =>
          val out = spark.sessionState
            .executePlan(subst(u.child, seen.toMap)).analyzed.output
          if (u.outputColumnNames.size < out.size) {
            val assigned = u.outputColumnNames.map(norm).toSet
            val padded = u.outputColumnNames ++
              out.zipWithIndex.drop(u.outputColumnNames.size).map {
                case (a, i) =>
                  if (assigned.contains(norm(a.name))) s"_col$i" else a.name
              }
            changed = true
            defPlan.copy(child = u.copy(outputColumnNames = padded))
          } else defPlan
        case None => defPlan
      }
      seen(norm(name)) = newDef
      (name, newDef, opt)
    }
    if (changed) w.copy(cteRelations = fixed) else w
  }
}
