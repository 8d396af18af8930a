package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the one-pass PiiScrub expression byte-identical to the chained
  * three-stage regexp_replace it replaced (r18), including the adversarial
  * overlap cases where a single-pass ALTERNATION would diverge.
  */
class PiiScrubSpec extends SparkSpec {

  private val cases = Seq(
    null,
    "",
    "no pii here at all",
    "mail me at alice.smith+x@example-host.co.uk today",
    "call 555-123-4567 or 555.987.6543",
    "server at 10.0.0.1 and 192.168.255.254",
    // phone-before-ip sequential semantics: chained yields "12.<PHONE>",
    // an email|phone|ip alternation would yield "<IP>2"
    "12.345.678.9012",
    // phone digits inside an email local part: the email pass wins first
    "123-456-7890@x.com",
    "a@b.co123-456-7890",
    "two emails a@b.co c@d.org, phone 111-222-3333, ip 1.2.3.4",
    "unicode naïve@exämple.com stays (non-ASCII domain not matched) ✓",
    "dots....1.2.3.4....end")

  test("PiiScrub == chained regexp_replace, cell for cell") {
    import spark.implicits._
    val df = cases.toDF("t")
    val chained = graft.operators.TextAnalysis.PiiPatterns
      .foldLeft(col("t")) { case (c, (pat, repl)) => regexp_replace(c, pat, repl) }
    val rows = df.select(col("t"), PiiScrub(col("t")).as("fast"),
      chained.as("ref")).collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2), s"input=${r.get(0)}")
    }
  }

  test("PiiScrub over the documents corpus == chained (sf0.001)") {
    import spark.implicits._
    val docs = graft.Engine.table(spark, sfDir, "documents")
    val chained = graft.operators.TextAnalysis.PiiPatterns
      .foldLeft(col("text")) { case (c, (pat, repl)) => regexp_replace(c, pat, repl) }
    val n = docs.select(PiiScrub(col("text")).as("a"), chained.as("b"))
      .filter(not($"a" <=> $"b")).count()
    assert(n == 0, s"$n corpus rows diverge")
  }
}
