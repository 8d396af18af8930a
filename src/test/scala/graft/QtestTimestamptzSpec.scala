package graft

/** Conformance wave 16e: the timestamptz family — ref ql/src/test/
  * queries/clientpositive/timestamptz.q, timestamptz_1.q,
  * timestamptz_2.q (expected instants from timestamptz_2.q.out, the one
  * generated under `set time zone UTC` — this suite's session zone; the
  * timestamptz.q/1.q outputs are the same instants rendered US/Pacific).
  *
  * Hive's `TIMESTAMP WITH LOCAL TIME ZONE` / `TIMESTAMPLOCALTZ` is an
  * instant rendered in the session zone — exactly Spark's default
  * TIMESTAMP (TIMESTAMP_LTZ). The Engine front door maps the Hive type
  * spellings (maybeTypeSpellings); zone-bearing string literals
  * ('... GMT-07:00', '... America/Los_Angeles') parse natively. Hive
  * additionally renders the zone suffix in cast-to-string — a TYPE
  * RENDERING difference, not an instant difference; assertions here
  * compare instants.
  *
  * KNOWN DIVERGENCE, pinned: the no-separator date+zone spelling
  * ('2016-01-03Europe/London') parses in Hive (midnight in that zone)
  * but answers NULL here — Spark's timestamp parser requires the zone
  * to follow a time or a space.
  */
class QtestTimestamptzSpec extends SparkSpec {

  private def sql1(q: String): Any =
    Engine.sql(spark, sfDir, q).head.get(0)

  test("timestamptz.q: zone-bearing casts through the Hive type " +
      "spellings resolve to the right instants") {
    // timestamptz.q.out row 1: 2005-01-02 18:01:00 US/Pacific = the GMT
    // wall clock itself under UTC
    assert(sql1("select cast(cast('2005-01-03 02:01:00 GMT' as timestamp " +
      "with local time zone) as string)") === "2005-01-03 02:01:00")
    // row 2: 12:26:34 Pacific = 20:26:34 UTC
    assert(sql1("select cast(cast('2016-01-03 12:26:34.0123 " +
      "America/Los_Angeles' as timestamplocaltz) as string)") ===
      "2016-01-03 20:26:34.0123")
    // row 4: 13:34:56 +1:00 = 12:34:56 UTC (04:34:56 Pacific)
    assert(sql1("select cast(cast('2016-01-03 13:34:56.38 +1:00' as " +
      "timestamplocaltz) as string)") === "2016-01-03 12:34:56.38")
    // the documented no-separator divergence (scaladoc)
    assert(sql1("select cast('2016-01-03Europe/London' as " +
      "timestamplocaltz)") === null)
  }

  test("timestamptz_2.q: the full DDL+DML sequence — zone-bearing " +
      "inserts, equality/range predicates, min/max, group/order, " +
      "self-join on instants (UTC session, instants pinned to the " +
      ".q.out)") {
    Engine.sql(spark, sfDir, "drop table if exists tstz2")
    try {
      Engine.sql(spark, sfDir,
        "create table tstz2(t timestamp with local time zone)")
      Engine.sql(spark, sfDir, "insert into table tstz2 values " +
        "('2005-04-03 03:01:00.04067 GMT-07:00')," +
        "('2005-01-03 02:01:00 GMT'),('2005-01-03 06:01:00 GMT+04:00')," +
        "('2013-06-03 02:01:00.30547 GMT+01:00')," +
        "('2016-01-03 12:26:34.0123 GMT+08:00')")
      def strs(q: String): Seq[String] =
        Engine.sql(spark, sfDir, q).collect()
          .map(_.get(0).toString.stripSuffix(".0")).toSeq
      assert(strs("select t from tstz2 where " +
        "t='2005-01-02 19:01:00 GMT-07:00'") ===
        Seq("2005-01-03 02:01:00", "2005-01-03 02:01:00"))
      assert(strs("select t from tstz2 where " +
        "t>'2013-06-03 02:01:00.30547 GMT+01:00'") ===
        Seq("2016-01-03 04:26:34.0123"))
      val mm = Engine.sql(spark, sfDir, "select min(t), max(t) from tstz2")
        .head
      assert(mm.get(0).toString.stripSuffix(".0") === "2005-01-03 02:01:00")
      assert(mm.get(1).toString === "2016-01-03 04:26:34.0123")
      assert(strs("select t from tstz2 group by t order by t") ===
        Seq("2005-01-03 02:01:00", "2005-04-03 10:01:00.04067",
          "2013-06-03 01:01:00.30547", "2016-01-03 04:26:34.0123"))
      assert(Engine.sql(spark, sfDir,
        "select a.t from tstz2 a join tstz2 b on a.t=b.t order by a.t")
        .count() === 4 + 3) // the duplicated 02:01:00 instant joins 2x2
    } finally Engine.sql(spark, sfDir, "drop table if exists tstz2")
  }
}
