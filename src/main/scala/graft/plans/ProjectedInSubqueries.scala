package graft.plans

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}

/** Exact three-valued semantics for IN-subqueries OUTSIDE the positions
  * Spark handles with its null-aware joins.
  *
  * Spark evaluates `x IN (subquery)` exactly (null-aware semi/anti
  * join) only when the predicate — or its direct negation — is a
  * top-level conjunct of a Filter. Anywhere else (a projected column,
  * `(x NOT IN (S)) IS NULL`, `(x IN (S)) = false`, a NOT over a
  * disjunction) the ExistenceJoin lowering answers FALSE where
  * Hive/standard SQL answers NULL: `SELECT 1 NOT IN (SELECT NULL)` is
  * false in stock Spark, NULL in the reference (ref
  * ql/parse/SubQueryUtils.java's notInCheck — Hive adds an explicit
  * null-count branch for exactly this case).
  *
  * This pre-analysis rewrite finds single-value InSubquery occurrences
  * in null-OBSERVABLE positions and lowers them to the aggregate CASE
  * form (the same shape [[QuantifiedSubqueries]] uses):
  *
  * {{{
  *   CASE WHEN NOT EXISTS (SELECT 1 FROM S)            THEN false
  *        WHEN EXISTS (SELECT 1 FROM S s WHERE s.c = x) THEN true
  *        WHEN x IS NULL
  *          OR EXISTS (SELECT 1 FROM S s WHERE s.c IS NULL) THEN NULL
  *        ELSE false END
  * }}}
  *
  * Null-INSENSITIVE positions keep Spark's efficient joins: inside a
  * Filter condition, any occurrence reachable from the root through
  * And/Or only (NULL and FALSE both drop the row), plus the canonical
  * `NOT (x IN S)` top-level conjunct (Spark's null-aware anti join is
  * exact there). Multi-value `(a, b) IN (S)` passes through untouched.
  */
object ProjectedInSubqueries {

  def apply(plan: LogicalPlan): LogicalPlan = {
    val rewritten = plan.transformDownWithSubqueries {
      case f: Filter =>
        val cond = rewriteFilterCondition(f.condition)
        if (cond eq f.condition) f else f.copy(condition = cond)
      // HAVING parses as its own node, and its bare IN conjuncts get
      // the same exact handling from Spark as Filter's — rewriting them
      // would push the aggregate probe into the subquery's WHERE
      case h: org.apache.spark.sql.catalyst.analysis.UnresolvedHaving =>
        val cond = rewriteFilterCondition(h.havingCondition)
        if (cond eq h.havingCondition) h
        else h.copy(havingCondition = cond)
      // JOIN conditions cannot host subqueries in Spark either way —
      // leave them so the canonical error names the user's own text
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      case other =>
        var changed = false
        val next = other.mapExpressions { e =>
          val r = rewriteExpr(e, insensitive = false)
          if (!(r eq e)) changed = true
          r
        }
        if (changed) next else other
    }
    if (rewritten eq plan) plan else rewritten
  }

  /** Top-level conjuncts keep exact Spark handling for bare IN and
    * NOT IN; everything below And/Or keeps it too (null ≡ false for row
    * selection there); any other wrapping makes the value observable.
    */
  private def rewriteFilterCondition(e: Expression): Expression = e match {
    case And(l, r) =>
      val (l2, r2) = (rewriteFilterCondition(l), rewriteFilterCondition(r))
      if ((l2 eq l) && (r2 eq r)) e else And(l2, r2)
    case Not(in: InSubquery) => e // Spark's null-aware anti join is exact
    case other => rewriteExpr(other, insensitive = true)
  }

  private def rewriteExpr(e: Expression, insensitive: Boolean): Expression =
    e match {
      case in: InSubquery if !insensitive && in.values.size == 1 =>
        lower(rewriteExpr(in.values.head, insensitive = false),
          in.query.plan)
      case _: InSubquery => e // insensitive position or multi-value
      case And(l, r) if insensitive =>
        val (l2, r2) = (rewriteExpr(l, true), rewriteExpr(r, true))
        if ((l2 eq l) && (r2 eq r)) e else And(l2, r2)
      case Or(l, r) if insensitive =>
        val (l2, r2) = (rewriteExpr(l, true), rewriteExpr(r, true))
        if ((l2 eq l) && (r2 eq r)) e else Or(l2, r2)
      case other =>
        var changed = false
        val next = other.mapChildren { c =>
          val r = rewriteExpr(c, insensitive = false)
          if (!(r eq c)) changed = true
          r
        }
        if (changed) next else other
    }

  /** Pure-EXISTS lowering — three existence joins rather than EXISTS +
    * count scalar subqueries: correlated scalar aggregates over an
    * aliased subquery trip Spark's decorrelation, and hand-assembled
    * Exists trees — though they ANALYZE identically to the parsed form
    * — decorrelate with stale attribute ids in the pulled-up join
    * condition (runtime INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND). So the
    * expression is built by PARSING the exact SQL shape with
    * placeholders and splicing the subquery plan / probe expression in,
    * which is bit-identical to what the user could have written by
    * hand (and is verified to execute).
    */
  private lazy val template: Expression =
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(
      "case when not exists(select 1 from __graft_sub __gq(__gc)) " +
        "then false " +
        "when exists(select 1 from __graft_sub __gq(__gc) " +
        "where __gq.__gc = __graft_x) then true " +
        "when __graft_x is null or exists(select 1 from __graft_sub " +
        "__gq(__gc) where __gq.__gc is null) then cast(null as boolean) " +
        "else false end")

  private def lower(x: Expression, sub: LogicalPlan): Expression = {
    def subst(p: LogicalPlan): LogicalPlan = p.transformUp {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
          if r.multipartIdentifier == Seq("__graft_sub") => sub.clone()
    }.transformAllExpressions {
      case UnresolvedAttribute(Seq("__graft_x")) => x.clone()
    }
    template.transformUp {
      case ex: Exists => ex.withNewPlan(subst(ex.plan))
      case UnresolvedAttribute(Seq("__graft_x")) => x.clone()
    }
  }
}
