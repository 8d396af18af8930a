package graft.operators

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

class MatchPathSpec extends SparkSpec {

  test("pattern parser handles quantifiers") {
    assert(MatchPath.parsePattern("A.B+.C*") ===
      Seq(MatchPath.Step("A", 1, 1), MatchPath.Step("B", 1, -1),
        MatchPath.Step("C", 0, -1)))
  }

  test("finds runs in a known sequence") {
    import spark.implicits._
    // one user: values LOW LOW HIGH HIGH HIGH LOW
    val df = Seq(
      (1L, 1L, 10.0), (1L, 2L, 10.0), (1L, 3L, 99.0),
      (1L, 4L, 99.0), (1L, 5L, 99.0), (1L, 6L, 10.0))
      .toDF("user_id", "seq", "v")
    val m = MatchPath.matchpath(df, "user_id", "seq",
      Seq("LOW" -> ($"v" < 50), "HIGH" -> ($"v" >= 50)),
      "LOW.HIGH+")
    val r = m.orderBy($"start_ord").collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 2L) // starts at the LOW right before the HIGH run
    assert(r(0).getLong(2) === 5L)
    assert(r(0).getInt(3) === 4)
  }

  test("backtracks when quantified symbols overlap the next step") {
    import spark.implicits._
    // every row satisfies A; the last also satisfies B: A+ must yield it back
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 9.0))
      .toDF("user_id", "seq", "v")
    val m = MatchPath.matchpath(df, "user_id", "seq",
      Seq("A" -> ($"v" > 0), "B" -> ($"v" >= 9)), "A+.B")
    val r = m.collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 1L && r(0).getLong(2) === 3L)
  }

  test("non-overlapping matches within a partition") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 1.0), (1L, 2L, 9.0), (1L, 3L, 1.0), (1L, 4L, 9.0))
      .toDF("user_id", "seq", "v")
    val m = MatchPath.matchpath(df, "user_id", "seq",
      Seq("A" -> ($"v" < 5), "B" -> ($"v" >= 5)), "A.B")
    assert(m.count() === 2)
  }

  test("streams a 1M-row single partition key with a tiny bounded buffer") {
    import spark.implicits._
    // one partition key, 1M rows: the old whole-group materialization would
    // need the full group in memory; the streaming scan holds <= one match
    // attempt (2 rows here), proven by the maxBufferRows = 8 guard rail
    val df = spark.range(1000000L).select(
      lit(1L).as("user_id"), ($"id" + 1).as("seq"),
      when($"id" % 2 === 0, 1.0).otherwise(9.0).as("v"))
    val m = MatchPath.matchpath(df, "user_id", "seq",
      Seq("A" -> ($"v" < 5), "B" -> ($"v" >= 5)), "A.B", maxBufferRows = 8)
    assert(m.count() === 500000L)
  }

  test("buffer guard rail fails fast instead of OOMing on a degenerate run") {
    import spark.implicits._
    val df = spark.range(100L).select(
      lit(1L).as("user_id"), ($"id" + 1).as("seq"), lit(1.0).as("v"))
    val ex = intercept[Exception] {
      MatchPath.matchpath(df, "user_id", "seq",
        Seq("A" -> ($"v" > 0)), "A+", maxBufferRows = 10).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("matchpath buffer exceeded")))
  }

  test("works over the events table (purchase after clicks)") {
    import spark.implicits._
    val events = Engine.table(spark, sfDir, "events")
      .withColumn("ord", unix_micros($"ts"))
    val m = MatchPath.matchpath(events, "user_id", "ord",
      Seq("CLICK" -> ($"event_type" === "click"),
        "BUY" -> ($"event_type" === "purchase")),
      "CLICK+.BUY")
    assert(m.count() > 0)
    assert(m.filter($"match_len" < 2).count() === 0)
  }
}
