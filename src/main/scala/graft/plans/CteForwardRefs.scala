package graft.plans

import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, UnresolvedWith}

/** Hive resolves WITH definitions by NAME, not by position — `WITH q1 AS
  * (SELECT ... FROM q2), q2 AS (...)` is legal (ref ql/.../parse/
  * SemanticAnalyzer.java CTE lookup; pinned by qtest cte_1.q's
  * forward-reference statement), where Spark's CTESubstitution is
  * strictly positional and fails the forward reference. This front-door
  * rewrite topologically sorts each `UnresolvedWith`'s definitions by
  * their reference graph, so the positional resolver sees dependency
  * order — one Seq permutation, no plan surgery.
  *
  * Conservative by construction; a WITH is left untouched (Spark's
  * canonical behavior stands) unless ALL of:
  *  - definition names are distinct;
  *  - no definition contains a nested WITH (inner shadowing could change
  *    which definition a name means);
  *  - the reference graph is acyclic (recursive WITH keeps its spelling).
  *
  * Front-door only (Engine.sql): the analyzer's CTESubstitution runs in
  * the Substitution batch, BEFORE any injectable resolution rule, so the
  * extensions path cannot reorder in time.
  */
object CteForwardRefs {

  private def norm(s: String): String = s.toLowerCase(Locale.ROOT)

  def apply(plan: LogicalPlan): LogicalPlan = {
    val here = plan match {
      case w: UnresolvedWith => reorder(w)
      case other => other
    }
    // identity-preserving descent: an untouched tree returns the SAME
    // instance, so Engine.sql's `substituted eq plan` fast path (run the
    // original text through spark.sql) stays live for WITH-free and
    // already-positional queries
    here match {
      case w: UnresolvedWith =>
        val newChild = apply(w.child)
        val newRels = w.cteRelations.map { case rel @ (n, d, cols) =>
          val nd = apply(d)
          if (nd eq d) rel else (n, nd.asInstanceOf[SubqueryAlias], cols)
        }
        val unchanged = (newChild eq w.child) &&
          newRels.zip(w.cteRelations).forall { case (a, b) => a eq b }
        if (unchanged) here
        else w.copy(child = newChild, cteRelations = newRels)
      case other =>
        other.mapChildren(apply).transformExpressions {
          case sq: SubqueryExpression =>
            val np = apply(sq.plan)
            if (np eq sq.plan) sq else sq.withNewPlan(np)
        }
    }
  }

  private def reorder(w: UnresolvedWith): UnresolvedWith = {
    val names = w.cteRelations.map(r => norm(r._1))
    if (names.distinct.size != names.size) return w
    val nameIdx = names.zipWithIndex.toMap
    val nested = w.cteRelations.exists(_._2.collectWithSubqueries {
      case _: UnresolvedWith => ()
    }.nonEmpty)
    if (nested) return w
    // which sibling definitions each definition references (single-part
    // names only — multi-part names are catalog references, never CTEs)
    val deps: Seq[Set[Int]] = w.cteRelations.map { case (_, d, _) =>
      val refs = scala.collection.mutable.Set[Int]()
      d.foreachWithSubqueries {
        case r: UnresolvedRelation if r.multipartIdentifier.size == 1 =>
          nameIdx.get(norm(r.multipartIdentifier.head)).foreach(refs += _)
        case _ => ()
      }
      refs.toSet
    }
    // already positional (every reference points backwards) — the common
    // case returns the SAME instance, so callers' `eq` fast paths hold
    if (deps.zipWithIndex.forall { case (ds, i) => ds.forall(_ < i) })
      return w
    // stable Kahn sort; a cycle (incl. self-recursion) leaves the
    // spelling alone for Spark to adjudicate
    val n = names.size
    val order = scala.collection.mutable.ArrayBuffer[Int]()
    val placed = new Array[Boolean](n)
    var progress = true
    while (order.size < n && progress) {
      progress = false
      (0 until n).foreach { i =>
        if (!placed(i) && deps(i).forall(placed)) {
          placed(i) = true
          order += i
          progress = true
        }
      }
    }
    if (order.size < n) return w
    w.copy(cteRelations = order.map(w.cteRelations).toSeq)
  }
}
