package graft

import org.apache.spark.sql.functions._

/** Conformance wave 16s: ORC predicate pushdown result-invariance —
  * ref ql/src/test/queries/clientpositive/orc_ppd_basic.q,
  * orc_ppd_decimal.q, orc_ppd_timestamp.q, orc_ppd_varchar.q,
  * orc_ppd_boolean.q. The reference's orc_ppd corpus pins that SARG
  * evaluation (row-group elimination) never changes RESULTS, only IO;
  * the Spark analog is spark.sql.orc.filterPushdown — each predicate
  * family here runs with pushdown ON and OFF over the canonical
  * alltypesorc file and must return identical multisets, with the ON
  * plan actually carrying pushed filters.
  */
class QtestOrcPpdSpec extends SparkSpec {

  private val orcPath = s"${QtestHarness.refData}/alltypesorc"

  private def rows(pushdown: Boolean, pred: String): Seq[String] = {
    val old = spark.conf.get("spark.sql.orc.filterPushdown", "true")
    try {
      spark.conf.set("spark.sql.orc.filterPushdown", pushdown.toString)
      spark.read.orc(orcPath).where(pred)
        .select(col("ctinyint"), col("csmallint"), col("cint"),
          col("cbigint"), col("cfloat"), col("cdouble"), col("cstring1"),
          col("ctimestamp1"), col("cboolean1"))
        .collect().map(_.toString).toSeq.sorted
    } finally spark.conf.set("spark.sql.orc.filterPushdown", old)
  }

  private val predicates = Seq(
    // orc_ppd_basic.q: integer family comparisons incl. negatives
    "ctinyint > 60" -> "tinyint range",
    "csmallint < -10000" -> "negative smallint",
    "cint between 100000 and 200000" -> "int between",
    "cbigint = -1887561756" -> "bigint point",
    // orc_ppd_basic.q: IN lists and null checks
    "ctinyint in (11, -64, 8)" -> "tinyint IN",
    "cint is null" -> "null check",
    "cstring1 is not null and cstring1 < 'b'" -> "string range + null",
    // orc_ppd_decimal/float
    "cfloat > 30.0" -> "float range",
    "cdouble between -80.0 and -60.0" -> "double between",
    // orc_ppd_timestamp.q
    "ctimestamp1 > timestamp'1969-12-31 23:59:58'" -> "timestamp range",
    // orc_ppd_boolean
    "cboolean1 = true and ctinyint < 0" -> "boolean + conjunct",
    // mixed conjunction that spans row groups
    "(cint > 0 or cbigint < 0) and cstring1 like 'c%'" ->
      "disjunction + like")

  test("qtest conformance: ORC filter pushdown is result-invariant " +
      "across every predicate family (orc_ppd_*.q)") {
    assume(new java.io.File(orcPath).exists(),
      "/root/reference alltypesorc not present")
    predicates.foreach { case (pred, label) =>
      withClue(s"[$label] $pred\n") {
        val on = rows(pushdown = true, pred)
        val off = rows(pushdown = false, pred)
        assert(on.size === off.size,
          s"row count differs with pushdown on/off")
        assert(on === off, "rows differ with pushdown on/off")
      }
    }
    // the suite must exercise real selections: at least 9 of the 12
    // predicates keep rows on this 12,288-row file
    val nonEmpty = predicates.count { case (p, _) =>
      rows(pushdown = true, p).nonEmpty }
    assert(nonEmpty >= 9, s"only $nonEmpty predicates kept rows — " +
      "the corpus no longer exercises the pushdown")
  }

  test("the ON plan actually pushes: PushedFilters reaches the ORC scan") {
    assume(new java.io.File(orcPath).exists(),
      "/root/reference alltypesorc not present")
    val old = spark.conf.get("spark.sql.orc.filterPushdown", "true")
    try {
      spark.conf.set("spark.sql.orc.filterPushdown", "true")
      val df = spark.read.orc(orcPath).where("cint > 100000")
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty)
      assert(scans.exists(_.metadata.get("PushedFilters")
          .exists(_.contains("GreaterThan(cint"))),
        scans.map(_.metadata.get("PushedFilters")).mkString(", "))
    } finally spark.conf.set("spark.sql.orc.filterPushdown", old)
  }
}
