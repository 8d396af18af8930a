package graft.plans

import org.apache.spark.sql.SparkSession

/** Hive configuration spellings with a live Spark equivalent: a
  * `SET hive.<key>=<v>` arriving at the front door also flips the
  * matching Spark conf, so .q scripts drive the same switches they do
  * on the reference. The SET statement itself still executes (Spark
  * stores arbitrary keys), keeping `SET -v`-style inspection intact.
  *
  * Mapped keys (the rest of Hive's ~2000 knobs are execution-engine
  * internals with no Spark meaning — they store as opaque session
  * entries):
  *  - `hive.support.quoted.identifiers` (ref ql/parse/ParseDriver's
  *    ALLOW_QUOTED_ID): `none` makes backquoted SELECT-list names
  *    REGEX column specs (union_regex.q's `(a1)?+.+`) ↔ Spark's
  *    `spark.sql.parser.quotedRegexColumnNames`; `column` restores
  *    identifier semantics.
  */
object HiveConfs {

  private val SetQuotedIds =
    """(?is)\s*set\s+hive\.support\.quoted\.identifiers\s*=\s*(\w+).*"""
      .r

  /** Call on every front-door statement BEFORE parsing; cheap (two
    * startsWith-class regex probes on statements that begin with SET).
    */
  def maybeMap(spark: SparkSession, query: String): Unit = {
    val t = query.trim
    if (t.length < 4 || !t.regionMatches(true, 0, "set", 0, 3)) return
    t match {
      case SetQuotedIds(v) =>
        spark.conf.set("spark.sql.parser.quotedRegexColumnNames",
          (v.equalsIgnoreCase("none")).toString)
      case _ => ()
    }
  }
}
