package graft.plans

/** Quantified comparison subqueries — `expr <op> ANY|SOME|ALL (SELECT
  * ...)` — are Hive SQL surface (ref ql/parse/SubQueryUtils.java +
  * the Calcite SubQueryRemoveRule lowering CalcitePlanner applies) that
  * Spark's parser rejects outright. This rewrite lowers each occurrence
  * to the same aggregate form Hive's planner produces — a CASE over the
  * subquery's `count(*)` / `count(col)` / `min(col)` / `max(col)` with
  * exact three-valued NULL semantics:
  *
  *   - `x = ANY (S)` is IN-semantics and `x <> ALL (S)` is NOT IN —
  *     but lowered through correlated EXISTS + counts rather than
  *     Spark's IN, whose ExistenceJoin answers FALSE instead of NULL
  *     outside top-level filters (`1 NOT IN (SELECT NULL)` is false in
  *     Spark, NULL in Hive/standard SQL);
  *   - `x > ANY (S)`: FALSE on empty S; TRUE if x clears min(S);
  *     otherwise NULL when x is NULL or S contains NULLs, else FALSE
  *     (dually with max/min for the other ordered operators);
  *   - `x > ALL (S)`: TRUE on empty S; FALSE if x fails against max(S);
  *     otherwise NULL when x is NULL or S contains NULLs, else TRUE;
  *   - `x = ALL (S)` / `x <> ANY (S)`: min=max equality with the same
  *     NULL accounting (and its exact 3VL negation).
  *
  * The duplicated scalar subqueries merge back into ONE aggregate scan
  * under Spark's MergeScalarSubqueries rule, so the plan matches the
  * reference's single-join lowering. `SOME` is a synonym for `ANY`
  * (ref Hive grammar). Only statements Spark itself cannot parse reach
  * this rewrite, and the result is parse-gated by the caller — nothing
  * that works today can be touched.
  */
object QuantifiedSubqueries {

  private case class Tok(text: String, start: Int, end: Int)

  private val CompareOps = Set("=", "==", "<>", "!=", ">", "<", ">=", "<=")

  /** Words that END a left-operand scan (backward, at paren depth 0). */
  private val Boundary = Set("AND", "OR", "NOT", "WHERE", "HAVING",
    "WHEN", "THEN", "ELSE", "CASE", "SELECT", "FROM", "ON", "JOIN",
    "BY", "IN", "LIKE", "BETWEEN", "IS", "ALL", "ANY", "SOME",
    "EXISTS", "UNION", "SET", "VALUES", "RETURNING")

  def rewrite(sql: String): Option[String] = {
    var cur = sql
    var changed = false
    var guard = 0
    var more = true
    while (more && guard < 32) {
      rewriteOne(cur) match {
        case Some(next) => cur = next; changed = true
        case None => more = false
      }
      guard += 1
    }
    if (changed) Some(cur) else None
  }

  private def tokenize(s: String): Vector[Tok] = {
    val n = s.length
    val out = Vector.newBuilder[Tok]
    var i = 0
    def isWord(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        val j = s.indexOf('\n', i); i = if (j < 0) n else j + 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        val j = s.indexOf("*/", i + 2); i = if (j < 0) n else j + 2
      } else if (c == '\'' || c == '"') {
        var j = i + 1
        var stop = -1
        while (j < n && stop < 0) {
          if (s.charAt(j) == '\\' && j + 1 < n) j += 2
          else if (s.charAt(j) == c) {
            if (j + 1 < n && s.charAt(j + 1) == c) j += 2 else stop = j + 1
          } else j += 1
        }
        val e = if (stop < 0) n else stop
        out += Tok(s.substring(i, e), i, e); i = e
      } else if (c == '`') {
        val j = s.indexOf('`', i + 1)
        val e = if (j < 0) n else j + 1
        out += Tok(s.substring(i, e), i, e); i = e
      } else if (isWord(c)) {
        var j = i
        while (j < n && isWord(s.charAt(j))) j += 1
        out += Tok(s.substring(i, j), i, j); i = j
      } else {
        // multi-char operators first
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        if (Set("<=", ">=", "<>", "!=", "==", "||").contains(two)) {
          out += Tok(two, i, i + 2); i += 2
        } else {
          out += Tok(c.toString, i, i + 1); i += 1
        }
      }
    }
    out.result()
  }

  private def rewriteOne(sql: String): Option[String] = {
    val toks = tokenize(sql)
    var k = toks.size - 1
    while (k >= 2) {
      val w = toks(k).text.toUpperCase
      if ((w == "ANY" || w == "SOME" || w == "ALL") &&
          k + 1 < toks.size && toks(k + 1).text == "(" &&
          CompareOps.contains(toks(k - 1).text) &&
          k + 2 < toks.size &&
          Set("SELECT", "WITH", "FROM").contains(
            toks(k + 2).text.toUpperCase)) {
        // subquery extent: match the paren at k+1
        var depth = 1
        var j = k + 2
        while (j < toks.size && depth > 0) {
          if (toks(j).text == "(") depth += 1
          else if (toks(j).text == ")") depth -= 1
          j += 1
        }
        if (depth == 0) {
          val close = j - 1
          val sub = sql.substring(toks(k + 1).end, toks(close).start)
          // left operand: scan backward from k-2
          var d = 0
          var b = k - 2
          var stop = -1
          while (b >= 0 && stop < 0) {
            val t = toks(b).text
            if (t == ")") d += 1
            else if (t == "(") {
              if (d == 0) stop = b else d -= 1
            } else if (d == 0 && (t == "," || t == ";" ||
                CompareOps.contains(t) ||
                Boundary.contains(t.toUpperCase))) stop = b
            if (stop < 0) b -= 1
          }
          val first = stop + 1
          if (first <= k - 2) {
            val x = sql.substring(toks(first).start, toks(k - 1).start).trim
            val op = toks(k - 1).text match {
              case "==" => "="
              case "!=" => "<>"
              case o => o
            }
            val quant = if (w == "ALL") "ALL" else "ANY"
            val repl = lower(x, op, quant, sub)
            return Some(sql.substring(0, toks(first).start) + repl +
              sql.substring(toks(close).end))
          }
        }
      }
      k -= 1
    }
    None
  }

  private def lower(x: String, op: String, quant: String,
      sub: String): String = {
    def cnt = s"(SELECT count(*) FROM ($sub) __gq)"
    def cntc = s"(SELECT count(__gc) FROM ($sub) __gq(__gc))"
    def mn = s"(SELECT min(__gc) FROM ($sub) __gq(__gc))"
    def mx = s"(SELECT max(__gc) FROM ($sub) __gq(__gc))"
    def nul = "cast(null as boolean)"
    // NOT x IN (sub): Spark's ExistenceJoin loses the NULL case outside
    // top-level filters (1 NOT IN (SELECT NULL) evaluates false, not
    // NULL) — so equality quantifiers lower through EXISTS + counts,
    // which is three-valued-exact in every context
    def eqAny =
      s"(CASE WHEN $cnt = 0 THEN false " +
        s"WHEN EXISTS (SELECT 1 FROM ($sub) __gq(__gc) " +
        s"WHERE __gc = ($x)) THEN true " +
        s"WHEN ($x) IS NULL OR $cnt > $cntc THEN $nul " +
        s"ELSE false END)"
    def eqAll =
      s"(CASE WHEN $cnt = 0 THEN true " +
        s"WHEN ($x) IS NULL THEN $nul " +
        s"WHEN $cntc = 0 THEN $nul " +
        s"WHEN ($x) = $mn AND ($x) = $mx THEN " +
        s"(CASE WHEN $cnt > $cntc THEN $nul ELSE true END) " +
        s"ELSE false END)"
    (op, quant) match {
      case ("=", "ANY") => eqAny
      case ("<>", "ALL") => s"(NOT $eqAny)"
      case ("=", "ALL") => eqAll
      case ("<>", "ANY") => s"(NOT $eqAll)"
      case (o, "ANY") =>
        val ext = if (o == ">" || o == ">=") mn else mx
        s"(CASE WHEN $cnt = 0 THEN false " +
          s"WHEN ($x) $o $ext THEN true " +
          s"WHEN ($x) IS NULL OR $cnt > $cntc THEN $nul " +
          s"ELSE false END)"
      case (o, "ALL") =>
        val ext = if (o == ">" || o == ">=") mx else mn
        s"(CASE WHEN $cnt = 0 THEN true " +
          s"WHEN ($x) IS NULL THEN $nul " +
          s"WHEN NOT (($x) $o $ext) THEN false " +
          s"WHEN $cnt > $cntc THEN $nul " +
          s"WHEN ($x) $o $ext THEN true " +
          s"ELSE $nul END)"
    }
  }
}
