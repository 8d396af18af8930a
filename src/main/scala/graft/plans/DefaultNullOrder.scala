package graft.plans

import org.apache.spark.sql.SparkSession

/** Hive's default ORDER BY / SORT BY null placement treats NULL as the
  * LARGEST value: a bare `ASC` sorts NULLS LAST and a bare `DESC` sorts
  * NULLS FIRST (ref common/../HiveConf.java `hive.default.nulls.last` =
  * true + ql/util/NullOrdering.java — NULLS_LAST maps to
  * NullValueOption.MAXVALUE, and `defaultNullOrder(order, conf)` flips
  * the placement for descending keys). Spark's parser defaults the
  * opposite way (NULL as smallest: ASC → NULLS FIRST, DESC → NULLS
  * LAST), and once parsed an explicit spelling is indistinguishable from
  * the default — so the Hive placement has to be made explicit in the
  * statement TEXT before the parse.
  *
  * This rewrite scans the statement outside string literals, quoted
  * identifiers and comments, finds every `ORDER BY` / `SORT BY` sort-item
  * list (top level, subqueries, window specs), and appends `NULLS LAST`
  * (or `NULLS FIRST` after an explicit `DESC`) to each item that does not
  * already spell its own null order. Explicit user placements pass
  * through untouched; `CLUSTER BY` is left alone (Spark's grammar takes
  * bare expressions there, not sort items). The result is parse-gated:
  * if the rewritten text does not parse, the original statement is used
  * unchanged, surfacing Spark's canonical behavior/error.
  */
object DefaultNullOrder {

  /** Words that end a sort-item list at paren depth 0. Deliberately NOT
    * in this set: CASE/WHEN/THEN/ELSE/END, IS/NOT/NULL, AND/OR/IN,
    * BETWEEN, OVER, FILTER — all legal inside a sort expression.
    */
  private val Terminators = Set("LIMIT", "OFFSET", "FETCH", "UNION",
    "EXCEPT", "INTERSECT", "MINUS", "WINDOW", "CLUSTER", "DISTRIBUTE",
    "SORT", "ORDER", "ROWS", "RANGE", "GROUPS", "INSERT", "SELECT",
    "FROM", "WHERE", "GROUP", "HAVING", "JOIN")

  def apply(spark: SparkSession, sql: String): String = {
    val u = sql.toUpperCase
    if (!u.contains("ORDER") && !u.contains("SORT")) return sql
    val out = rewrite(sql)
    if (out == sql) sql
    else try { spark.sessionState.sqlParser.parsePlan(out); out }
    catch { case scala.util.control.NonFatal(_) => sql }
  }

  private def isWord(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Returns (position after the noise run, whether it was significant
    * content): literals and quoted identifiers are content, comments are
    * not; returns (i, false) when `i` is not at a noise start.
    */
  private def noise(s: String, i: Int): (Int, Boolean) = {
    val n = s.length
    s.charAt(i) match {
      case q @ ('\'' | '"') =>
        var j = i + 1
        while (j < n) {
          if (s.charAt(j) == '\\' && j + 1 < n) j += 2
          else if (s.charAt(j) == q) {
            if (j + 1 < n && s.charAt(j + 1) == q) j += 2
            else return (j + 1, true)
          } else j += 1
        }
        (n, true)
      case '`' =>
        val j = s.indexOf('`', i + 1)
        (if (j < 0) n else j + 1, true)
      case '-' if i + 1 < n && s.charAt(i + 1) == '-' =>
        val j = s.indexOf('\n', i)
        (if (j < 0) n else j + 1, false)
      case '/' if i + 1 < n && s.charAt(i + 1) == '*' =>
        val j = s.indexOf("*/", i + 2)
        (if (j < 0) n else j + 2, false)
      case _ => (i, false)
    }
  }

  private[graft] def rewrite(s: String): String = {
    val n = s.length
    val inserts = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var i = 0
    while (i < n) {
      val (ni, _) = noise(s, i)
      if (ni > i) i = ni
      else if (isWord(s.charAt(i)) && (i == 0 || !isWord(s.charAt(i - 1)))) {
        var j = i
        while (j < n && isWord(s.charAt(j))) j += 1
        val w = s.substring(i, j).toUpperCase
        if (w == "ORDER" || w == "SORT") {
          var k = j
          while (k < n && s.charAt(k).isWhitespace) k += 1
          var k2 = k
          while (k2 < n && isWord(s.charAt(k2))) k2 += 1
          if (s.substring(k, k2).toUpperCase == "BY") {
            scanList(s, k2, inserts)
            // resume right after BY: nested ORDER BY inside an item is
            // found by this same loop and handled as its own list
            i = k2
          } else i = j
        } else i = j
      } else i += 1
    }
    if (inserts.isEmpty) s
    else {
      val sb = new StringBuilder
      var prev = 0
      inserts.sortBy(_._1).foreach { case (p, t) =>
        sb.append(s.substring(prev, p)).append(t); prev = p
      }
      sb.append(s.substring(prev, n)).toString
    }
  }

  /** Scans one sort-item list from `start`, appending an insertion for
    * each item that lacks an explicit NULLS placement. Stops at the
    * list's end: an unbalanced `)`, a depth-0 terminator keyword, `;`,
    * or end of input.
    */
  private def scanList(s: String, start: Int,
      inserts: scala.collection.mutable.ArrayBuffer[(Int, String)]): Unit = {
    val n = s.length
    var i = start
    var depth = 0
    var sawNulls = false
    var lastWord = ""
    var lastSig = -1 // index just past the item's last significant char
    def endItem(): Unit = {
      if (lastSig > 0 && !sawNulls)
        inserts += ((lastSig,
          if (lastWord == "DESC") " NULLS FIRST" else " NULLS LAST"))
      sawNulls = false; lastWord = ""; lastSig = -1
    }
    while (i < n) {
      val (ni, content) = noise(s, i)
      if (ni > i) {
        if (content) { lastSig = ni; if (depth == 0) lastWord = "" }
        i = ni
      } else {
        val c = s.charAt(i)
        if (c == '(') { depth += 1; lastSig = i + 1; i += 1 }
        else if (c == ')') {
          if (depth == 0) { endItem(); return }
          depth -= 1; lastSig = i + 1; if (depth == 0) lastWord = ""
          i += 1
        } else if (c == ',' && depth == 0) { endItem(); i += 1 }
        else if (c == ';' && depth == 0) { endItem(); return }
        else if (isWord(c) && (i == 0 || !isWord(s.charAt(i - 1)))) {
          var j = i
          while (j < n && isWord(s.charAt(j))) j += 1
          val w = s.substring(i, j).toUpperCase
          if (depth == 0 && Terminators(w)) { endItem(); return }
          if (depth == 0) {
            if (w == "NULLS") sawNulls = true
            lastWord = w
          }
          lastSig = j
          i = j
        } else {
          if (!c.isWhitespace) { lastSig = i + 1; if (depth == 0) lastWord = "" }
          i += 1
        }
      }
    }
    endItem()
  }
}
