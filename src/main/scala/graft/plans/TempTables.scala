package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** Hive's `CREATE TEMPORARY TABLE` (ref ql/parse HiveParser.g
  * createTableStatement KW_TEMPORARY; the temp_table_* corpus) is a
  * real, writable, session-scoped table. Spark parses the spelling
  * into its deprecated temp-view legacy form, which can be neither
  * inserted into nor CTAS'd — so the front door drops the TEMPORARY
  * keyword pre-parse and materializes an ordinary catalog table.
  *
  * Documented scope trade: lifetime becomes the catalog's rather than
  * the session's (Hive drops these at session end). Every query,
  * write, and DDL against the table behaves identically; a session
  * wanting the auto-drop owns it with an explicit DROP. TEMPORARY
  * VIEW / FUNCTION / MACRO spellings are untouched.
  */
object TempTables {

  private val Pattern =
    """(?i)\bCREATE\s+TEMPORARY\s+(EXTERNAL\s+)?TABLE\b""".r

  def apply(spark: SparkSession, sql: String): String = {
    val t = sql.trim
    if (t.length < 6 || !t.regionMatches(true, 0, "create", 0, 6))
      return sql
    if (Pattern.findFirstIn(sql).isEmpty) return sql
    val rewritten = Pattern.replaceAllIn(sql, "CREATE TABLE")
    try {
      spark.sessionState.sqlParser.parsePlan(rewritten)
      rewritten
    } catch { case NonFatal(_) => sql }
  }
}
