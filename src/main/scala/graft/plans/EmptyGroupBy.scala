package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** Hive parses a bare `GROUP BY ()` as the explicit empty grouping set
  * — a global aggregate that answers its one row even over empty input
  * (ref ql/parse/IdentifiersParser.g `groupByEmpty`; groupby_empty.q).
  * Spark's grammar rejects the spelling outright, so it is respelled
  * pre-parse as `GROUP BY GROUPING SETS (())`, which Spark parses and
  * [[EmptyGroupingSets]] then gives the Hive empty-input semantics.
  *
  * Parse-gated like the other text rewrites: the respelled statement
  * must parse or the original text (and Spark's canonical error) is
  * kept. The regex requires the `()` immediately after GROUP BY, so
  * `GROUP BY GROUPING SETS ((), (a))` and ordinary column lists never
  * match.
  */
object EmptyGroupBy {

  private val Pattern = """(?i)\bGROUP\s+BY\s*\(\s*\)""".r

  def apply(spark: SparkSession, sql: String): String = {
    if (Pattern.findFirstIn(sql).isEmpty) return sql
    val rewritten =
      Pattern.replaceAllIn(sql, "GROUP BY GROUPING SETS (())")
    try {
      spark.sessionState.sqlParser.parsePlan(rewritten)
      rewritten
    } catch { case NonFatal(_) => sql }
  }
}
