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
