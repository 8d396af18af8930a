package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** Hive's `CREATE TABLE ... STORED AS PARQUET|ORC` (ref ql/parse
  * HiveParser.g tableFileFormat; the parquet and orc qtest corpora
  * spell every fixture this way) parses in Spark as a Hive-serde
  * table and
  * dies with NOT_SUPPORTED_COMMAND_WITHOUT_HIVE_SUPPORT on an
  * in-memory catalog. For the two NATIVE formats the datasource table
  * is semantically identical, so the spelling rewrites pre-parse to
  * `USING parquet|orc`. Other formats (TEXTFILE/AVRO/RCFILE/SEQUENCE-
  * FILE) carry SerDe semantics a datasource swap would change — they
  * keep Spark's canonical error (the engine's text/binary format
  * bridges serve those surfaces by path, not by catalog DDL).
  *
  * Parse-gated like the sibling text rewrites: the rewritten statement
  * must parse or the original text is kept. Only CREATE-led statements
  * are touched, so the phrase inside string literals elsewhere is
  * never at risk.
  */
object StoredAs {

  private val Pattern =
    """(?i)\bSTORED\s+AS\s+(PARQUET|ORC)\b""".r

  /** Hive's PARTITIONED BY declares EXTRA columns (name + type);
    * Spark's USING form lists the partition columns in the main list
    * and references them by NAME after USING — so the typed defs move
    * into the column list and the names trail the format.
    */
  private val PartPattern =
    """(?is)\)\s*PARTITIONED\s+BY\s*\(([^)]*)\)\s*STORED\s+AS\s+(PARQUET|ORC)\b""".r

  /** Spark's grammar puts USING before the bucket clauses; Hive's
    * STORED AS trails them — `CLUSTERED BY (k) SORTED BY (k) INTO n
    * BUCKETS STORED AS PARQUET` moves the format in front of the
    * bucket spec (the smb corpus spells every fixture this way).
    */
  private val BucketPattern =
    ("""(?is)\)\s*(CLUSTERED\s+BY\s*\([^)]*\)""" +
      """(?:\s*SORTED\s+BY\s*\([^)]*\))?\s*INTO\s+\d+\s+BUCKETS)""" +
      """\s*STORED\s+AS\s+(PARQUET|ORC)\b""").r

  private val PartBucketPattern =
    ("""(?is)\)\s*PARTITIONED\s+BY\s*\(([^)]*)\)\s*""" +
      """(CLUSTERED\s+BY\s*\([^)]*\)""" +
      """(?:\s*SORTED\s+BY\s*\([^)]*\))?\s*INTO\s+\d+\s+BUCKETS)""" +
      """\s*STORED\s+AS\s+(PARQUET|ORC)\b""").r

  def apply(spark: SparkSession, sql: String): String = {
    val t = sql.trim
    if (t.length < 6 || !t.regionMatches(true, 0, "create", 0, 6))
      return sql
    if (Pattern.findFirstIn(sql).isEmpty) return sql
    // partitioned AND bucketed: typed partition defs move into the
    // column list, USING leads, both clauses follow (Spark's
    // createTableClauses are order-insensitive after the provider)
    val partBucketed = PartBucketPattern.replaceAllIn(sql, m => {
      val defs = m.group(1).trim
      val names = defs.split(",").map(_.trim.split("\\s+").head)
      java.util.regex.Matcher.quoteReplacement(
        s", $defs) USING ${m.group(3).toLowerCase} " +
          s"PARTITIONED BY (${names.mkString(", ")}) ${m.group(2)}")
    })
    val bucketed = BucketPattern.replaceAllIn(partBucketed, m =>
      java.util.regex.Matcher.quoteReplacement(
        s") USING ${m.group(2).toLowerCase} ${m.group(1)}"))
    val moved = PartPattern.replaceAllIn(bucketed, m => {
      val defs = m.group(1).trim
      val names = defs.split(",").map(_.trim.split("\\s+").head)
      java.util.regex.Matcher.quoteReplacement(
        s", $defs) USING ${m.group(2).toLowerCase} " +
          s"PARTITIONED BY (${names.mkString(", ")})")
    })
    val rewritten =
      Pattern.replaceAllIn(moved, m => "USING " + m.group(1).toLowerCase)
    try {
      spark.sessionState.sqlParser.parsePlan(rewritten)
      rewritten
    } catch { case NonFatal(_) => sql }
  }
}
