package graft

/** Conformance wave 16a: the reference's timestamp family — ref ql/src/
  * test/queries/clientpositive/timestamp_1.q, timestamp_2.q,
  * timestamp_literal.q, udf_to_unix_timestamp.q, udf_hour.q,
  * udf_minute.q, udf_second.q, udf_weekofyear.q,
  * udf_from_utc_timestamp.q, udf_to_utc_timestamp.q (expected cells from
  * results/clientpositive/llap where .q.out-pinned; the UTC-session
  * blocks only — the reference re-runs some under US/Pacific).
  *
  * Wave finding (fixed in HiveFunctions): Hive's hour/minute/second
  * parse TIME-ONLY strings (hour('13:14:15') = 13, ref UDFHour.java's
  * HH:mm:ss fallback) where a bare timestamp cast answers NULL.
  */
class QtestTimestampSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    // timestamp -> numeric casts: int/bigint are epoch seconds;
    // tinyint/smallint overflow to NULL; float/double keep fraction;
    // boolean is true for nonzero (timestamp_1.q.out first block, UTC)
    QCase("timestamp_1.q", "ts01",
      "select cast(t as boolean) AS a, cast(t as int) AS b, " +
        "cast(t as bigint) AS c, cast(t as double) AS d, " +
        "cast(t as string) AS e " +
        "from (select timestamp '2011-01-01 01:01:01' AS t) x",
      duck = Some(""),
      hive = Some(Seq("true", "1293843661", "1293843661",
        "1.293843661E9", "2011-01-01 01:01:01"))),

    QCase("timestamp_1.q", "ts02",
      "select cast(t as tinyint) AS a, cast(t as smallint) AS b " +
        "from (select timestamp '2011-01-01 01:01:01' AS t) x",
      duck = Some(""), hive = Some(Seq("NULL", "NULL")),
      note = "epoch seconds overflow tinyint/smallint -> NULL, not wrap"),

    QCase("timestamp_1.q", "ts03",
      "select cast(t as float) AS a " +
        "from (select timestamp '2011-01-01 01:01:01' AS t) x",
      duck = Some(""), hive = Some(Seq("1.2938437E9")),
      note = "float keeps reduced precision of the epoch value"),

    // fractional-second literal precision survives comparison
    QCase("timestamp_literal.q", "ts04",
      "select timestamp '2011-01-01 01:01:01' AS a, " +
        "('2011-01-01 01:01:01.101' <> timestamp '2011-01-01 01:01:01.100') AS b",
      duck = Some("select timestamp '2011-01-01 01:01:01' AS a, " +
        "(timestamp '2011-01-01 01:01:01.101' <> timestamp '2011-01-01 01:01:01.100') AS b")),

    QCase("timestamp_literal.q", "ts05",
      "select 1 AS one where timestamp '2011-01-01 01:01:01.101' <> " +
        "timestamp '2011-01-01 01:01:01.100'"),

    // to_unix_timestamp: bare, formatted, and unparseable -> NULL
    // (UTC session; the .q.out numbers are Pacific, so the oracle is
    // DuckDB's epoch over the same instants)
    QCase("udf_to_unix_timestamp.q", "ts06",
      "select to_unix_timestamp('2009-03-20 11:30:01') AS a, " +
        "to_unix_timestamp('2009-03-20', 'yyyy-MM-dd') AS b, " +
        "to_unix_timestamp('random_string') AS c",
      duck = Some("select epoch(timestamp '2009-03-20 11:30:01') AS a, " +
        "epoch(timestamp '2009-03-20 00:00:00') AS b, " +
        "NULL AS c")),

    // hour/minute/second over timestamp strings, TIME-ONLY strings, and
    // bare dates (udf_hour.q.out / udf_minute.q.out / udf_second.q.out)
    QCase("udf_hour.q", "ts07",
      "select hour('2009-08-07 13:14:15') AS a, hour('13:14:15') AS b, " +
        "hour('2009-08-07') AS c, " +
        "hour(cast('2009-08-07 13:14:15' as timestamp)) AS d",
      duck = Some(""), hive = Some(Seq("13", "13", "0", "13"))),

    QCase("udf_minute.q", "ts08",
      "select minute('2009-08-07 13:14:15') AS a, minute('13:14:15') AS b, " +
        "minute('2009-08-07') AS c",
      duck = Some(""), hive = Some(Seq("14", "14", "0"))),

    QCase("udf_second.q", "ts09",
      "select second('2009-08-07 13:14:15') AS a, second('13:14:15') AS b, " +
        "second('2009-08-07') AS c",
      duck = Some(""), hive = Some(Seq("15", "15", "0"))),

    // ISO week-of-year incl. the year-53 / week-52 boundary years
    QCase("udf_weekofyear.q", "ts10",
      "select weekofyear('1980-01-01') AS a, weekofyear('1980-01-06') AS b, " +
        "weekofyear('1980-01-07') AS c, weekofyear('1980-12-31') AS d, " +
        "weekofyear('1984-1-1') AS e, weekofyear('2008-02-20 00:00:00') AS f, " +
        "weekofyear('1980-12-28 23:59:59') AS g, " +
        "weekofyear('1980-12-29 23:59:59') AS h",
      duck = Some(""),
      hive = Some(Seq("1", "1", "2", "1", "52", "8", "52", "1"))),

    QCase("udf_weekofyear.q", "ts11",
      "select weekofyear('1007-01-01 10:13:14') AS a, " +
        "weekofyear('1008-01-01 10:13:14') AS b, " +
        "weekofyear('1009-01-01 10:13:14') AS c",
      duck = Some(""), hive = Some(Seq("1", "53", "52"))),

    // from_utc_timestamp across named zones, offsets, NULL args
    QCase("udf_from_utc_timestamp.q", "ts12",
      "select cast(from_utc_timestamp('2012-02-11 04:30:00', 'PST') as string) AS a, " +
        "cast(from_utc_timestamp('2012-02-11 04:30:00', 'Europe/Moscow') as string) AS b, " +
        "cast(from_utc_timestamp('2012-02-11 04:30:00', 'GMT+8') as string) AS c, " +
        "cast(from_utc_timestamp('2012-02-11 04:30:00', 'GMT') as string) AS d, " +
        "from_utc_timestamp(cast(null as string), 'PST') AS e, " +
        "from_utc_timestamp('2012-02-11 04:30:00', cast(null as string)) AS f",
      duck = Some(""),
      hive = Some(Seq("2012-02-10 20:30:00", "2012-02-11 08:30:00",
        "2012-02-11 12:30:00", "2012-02-11 04:30:00", "NULL", "NULL"))),

    QCase("udf_from_utc_timestamp.q", "ts13",
      "select cast(from_utc_timestamp(cast('2012-02-11 04:30:00' as timestamp), 'PST') as string) AS a, " +
        "cast(from_utc_timestamp(cast('2012-02-11 04:30:00' as timestamp), 'GMT+8') as string) AS b, " +
        "from_utc_timestamp(cast(null as timestamp), 'PST') AS c",
      duck = Some(""),
      hive = Some(Seq("2012-02-10 20:30:00", "2012-02-11 12:30:00", "NULL"))),

    QCase("udf_to_utc_timestamp.q", "ts14",
      "select cast(to_utc_timestamp('2012-02-10 20:30:00', 'PST') as string) AS a, " +
        "cast(to_utc_timestamp('2012-02-11 08:30:00', 'Europe/Moscow') as string) AS b, " +
        "cast(to_utc_timestamp('2012-02-11 12:30:00', 'GMT+8') as string) AS c, " +
        "cast(to_utc_timestamp('2012-02-11 04:30:00', 'GMT') as string) AS d, " +
        "to_utc_timestamp(cast(null as string), 'PST') AS e, " +
        "to_utc_timestamp('2012-02-11 04:30:00', cast(null as string)) AS f",
      duck = Some(""),
      hive = Some(Seq("2012-02-11 04:30:00", "2012-02-11 04:30:00",
        "2012-02-11 04:30:00", "2012-02-11 04:30:00", "NULL", "NULL"))),

    // to_epoch_milli round trip (udf_from_utc_timestamp.q's tail)
    QCase("udf_from_utc_timestamp.q", "ts15",
      "select to_epoch_milli(cast('2012-02-11 04:30:00' as timestamp)) AS a, " +
        "cast(cast(to_epoch_milli(cast('2012-02-11 04:30:00' as timestamp)) " +
        "  as double) / 1000 as bigint) AS b",
      duck = Some("select epoch_ms(timestamp '2012-02-11 04:30:00') AS a, " +
        "epoch(timestamp '2012-02-11 04:30:00') AS b")))

  test("qtest conformance: timestamp family (numeric casts, literals, " +
      "to_unix_timestamp, time-only hour/minute/second, weekofyear, " +
      "from/to_utc_timestamp)") {
    run("timestamp_", "udf_to_unix", "udf_hour", "udf_minute", "udf_second",
      "udf_weekofyear", "udf_from_utc", "udf_to_utc")
  }
}
