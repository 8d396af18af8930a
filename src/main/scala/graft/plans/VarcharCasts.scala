package graft.plans

import org.apache.spark.sql.SparkSession

/** Hive truncates on CAST to a bounded varchar — `CAST('abcdef' AS
  * VARCHAR(3))` is 'abc' (ref serde2/typeinfo/VarcharTypeInfo +
  * GenericUDFToVarchar; varchar_cast.q / varchar_udf1.q) — while
  * Spark's parser rewrites the cast target to plain STRING and
  * discards the length before the plan exists (CharVarcharUtils.
  * replaceCharVarcharWithStringForCast), so the truncation cannot be
  * recovered plan-side. This pre-parse TEXT rewrite lowers each
  * `CAST(expr AS VARCHAR(n))` to `substr(CAST(expr AS STRING), 1, n)`,
  * which is exactly Hive's character-count truncation.
  *
  * CHAR casts stay untouched: their Hive semantics interleave
  * truncation with blank-padding and stripped-length accounting that a
  * string expression cannot represent faithfully — the engine's
  * documented char_1 divergence stands. DDL column types (`c
  * varchar(10)` — no CAST..AS spelling) never match. The caller
  * parse-gates the result.
  */
object VarcharCasts {

  private val TypeRe =
    """(?is)^\s*varchar\s*\(\s*(\d+)\s*\)\s*$""".r

  private val ZeroLenRe = """(?i)\b(var)?char\s*\(\s*0\s*\)""".r

  def apply(spark: SparkSession, sql: String): String = {
    // Hive refuses zero-length char/varchar outright (ref serde2/
    // typeinfo/BaseCharTypeInfo validation; invalid_varchar_length_1.q,
    // invalid_char_length_1.q) — Spark silently treats them as string
    ZeroLenRe.findFirstIn(sql).foreach { t =>
      throw new IllegalArgumentException(
        s"invalid ${t.trim} type: length must be between 1 and " +
          (if (t.toLowerCase.startsWith("var")) "65535" else "255"))
    }
    if (!sql.toUpperCase.contains("VARCHAR")) return sql
    val out = rewrite(sql)
    if (out == sql) sql
    else try { spark.sessionState.sqlParser.parsePlan(out); out }
    catch { case scala.util.control.NonFatal(_) => sql }
  }

  private[graft] def rewrite(sql: String): String = {
    var cur = sql
    var guard = 0
    var more = true
    while (more && guard < 64) {
      rewriteOne(cur) match {
        case Some(next) => cur = next
        case None => more = false
      }
      guard += 1
    }
    cur
  }

  private def isWord(c: Char) = c.isLetterOrDigit || c == '_'

  private def rewriteOne(s: String): Option[String] = {
    val n = s.length
    var i = 0
    while (i < n) {
      s.charAt(i) match {
        case '\'' =>
          i += 1
          while (i < n && s.charAt(i) != '\'') i += 1
          i += 1
        case '-' if i + 1 < n && s.charAt(i + 1) == '-' =>
          val j = s.indexOf('\n', i); i = if (j < 0) n else j + 1
        case c if isWord(c) && (i == 0 || !isWord(s.charAt(i - 1))) =>
          var j = i
          while (j < n && isWord(s.charAt(j))) j += 1
          if (s.substring(i, j).equalsIgnoreCase("CAST")) {
            tryAt(s, i, j) match {
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

  /** At a CAST keyword: match the balanced group, split at the LAST
    * top-level AS (the operand may itself contain casts), and check the
    * type side. Returns the rewritten statement or None.
    */
  private def tryAt(s: String, castStart: Int, castEnd: Int): Option[String] = {
    val n = s.length
    var k = castEnd
    while (k < n && s.charAt(k).isWhitespace) k += 1
    if (k >= n || s.charAt(k) != '(') return None
    val open = k
    var d = 0
    var lastAs = -1 // index of the last depth-1 AS keyword
    while (k < n) {
      val c = s.charAt(k)
      if (c == '\'') { k += 1
        while (k < n && s.charAt(k) != '\'') k += 1 }
      else if (c == '(') d += 1
      else if (c == ')') {
        d -= 1
        if (d == 0) {
          if (lastAs < 0) return None
          val operand = s.substring(open + 1, lastAs)
          val tpe = s.substring(lastAs + 2, k)
          tpe match {
            case TypeRe(len) if len.toInt == 0 =>
              // Hive refuses zero-length varchar/char outright (ref
              // serde2/typeinfo/BaseCharUtils.validateParameter;
              // invalid_varchar_length_1.q) — Spark would accept it
              throw new IllegalArgumentException(
                s"invalid ${tpe.trim} type: length must be between " +
                  "1 and 65535")
            case TypeRe(len) if len.toInt <= 65535 =>
              return Some(s.substring(0, castStart) +
                s"substr(CAST($operand AS STRING), 1, $len)" +
                s.substring(k + 1))
            case _ => return None
          }
        }
      } else if (d == 1 && isWord(c) &&
          (k == 0 || !isWord(s.charAt(k - 1)))) {
        var j = k
        while (j < n && isWord(s.charAt(j))) j += 1
        if (s.substring(k, j).equalsIgnoreCase("AS")) lastAs = k
        k = j - 1
      }
      k += 1
    }
    None
  }
}
