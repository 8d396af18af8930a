package graft

/** Conformance wave 16ae: string->numeric cast edges and
  * DISTINCT-over-aggregate shapes (ref ql/src/test/queries/
  * clientpositive/cast2.q, cast_to_int.q, distinct_groupby.q;
  * expected cells from results/clientpositive/llap). The cast rows
  * are hive-leg pinned (DuckDB hard-errors on malformed numerics);
  * the distinct-aggregate rows run DuckDB twins.
  */
class QtestCastWave16aeSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("cast2.q", "ae01",
      "select cast('1' as tinyint) AS c1, cast('1' as smallint) AS " +
        "c2, cast('1' as int) AS c3, cast('1' as bigint) AS c4, " +
        "cast('1' as float) AS c5, cast('1' as double) AS c6, " +
        "cast('1' as decimal(10,2)) AS c7",
      duck = Some(""),
      hive = Some(Seq("1", "1", "1", "1", "1", "1", "1"))),
    QCase("cast2.q", "ae02",
      "select cast(' 1 ' as tinyint) AS c1, cast(' 1 ' as smallint) " +
        "AS c2, cast(' 1 ' as int) AS c3, cast(' 1 ' as bigint) AS " +
        "c4, cast(' 1 ' as float) AS c5, cast(' 1 ' as double) AS " +
        "c6, cast(' 1 ' as decimal(10,2)) AS c7",
      duck = Some(""),
      hive = Some(Seq("1", "1", "1", "1", "1", "1", "1")),
      note = "surrounding whitespace trims before every numeric parse"),
    QCase("cast2.q", "ae03",
      "select cast('.0000 ' as decimal(8,4)) AS c1, cast(' .0000' " +
        "as decimal(8,4)) AS c2, cast(' .0000  ' as decimal(8,4)) " +
        "AS c3, cast('.' as decimal(8,4)) AS c4, cast('.  ' as " +
        "decimal(8,4)) AS c5, cast('  .  ' as decimal(8,4)) AS c6, " +
        "cast('.00 00 ' as decimal(8,4)) AS c7",
      duck = Some(""),
      hive = Some(Seq("0", "0", "0", "NULL", "NULL", "NULL", "NULL")),
      note = "a bare dot or interior whitespace is NOT a number; " +
        "leading-dot zeros are"),
    QCase("cast_to_int.q", "ae04",
      "select cast('1' as float) AS c1, cast('1.4' as float) AS c2, " +
        "cast('1.6' as float) AS c3, cast('1' as int) AS c4, " +
        "cast('1.4' as int) AS c5, cast('1.6' as int) AS c6, " +
        "cast('1' as tinyint) AS c7, cast('1.4' as tinyint) AS c8, " +
        "cast('1.6' as tinyint) AS c9, cast('1' as bigint) AS c10, " +
        "cast('1.4' as bigint) AS c11, cast('1.6' as bigint) AS " +
        "c12, cast(cast('1' as float) as int) AS c13, " +
        "cast(cast('1.4' as float) as int) AS c14, " +
        "cast(cast('1.6' as float) as int) AS c15, " +
        "cast('+1e5' as int) AS c16, cast('2147483647' as int) AS " +
        "c17, cast('-2147483648' as int) AS c18, cast('32767' as " +
        "smallint) AS c19, cast('-32768' as smallint) AS c20, " +
        "cast('-128' as tinyint) AS c21, cast('127' as tinyint) AS " +
        "c22, cast('1.0a' as int) AS c23, cast('-1.-1' as int) AS c24",
      duck = Some(""),
      hive = Some(Seq("1", "1.4", "1.6", "1", "1", "1", "1", "1",
        "1", "1", "1", "1", "1", "1", "1", "NULL", "2147483647",
        "-2147483648", "32767", "-32768", "-128", "127", "NULL",
        "NULL")),
      note = "decimal strings TRUNCATE toward zero into integral " +
        "types; scientific notation and trailing garbage answer NULL"),
    QCase("distinct_groupby.q", "ae05",
      "select distinct key from qt_src1 group by key, value",
      note = "DISTINCT over a finer grouping collapses to the " +
        "projected column"),
    QCase("distinct_groupby.q", "ae06",
      "select distinct count(value) AS c from qt_src group by key"),
    QCase("distinct_groupby.q", "ae07",
      "select distinct count(*) AS c from qt_src1 where key in " +
        "('128','146','150')",
      note = "global aggregate: DISTINCT over one row is that row"),
    QCase("distinct_groupby.q", "ae08",
      "select distinct count(*)+1 AS c from qt_src1"),
    QCase("distinct_groupby.q", "ae09",
      "select distinct count(a.value) AS c1, count(b.value) AS c2 " +
        "from qt_src a join qt_src1 b on a.key=b.key"),
    QCase("distinct_groupby.q", "ae10",
      "select distinct c from (select distinct key, count(*) as c " +
        "from qt_src1 where key in ('128','146','150') group by " +
        "key) a",
      note = "DISTINCT over per-key counts dedups equal counts"),
    QCase("distinct_groupby.q", "ae11",
      "select distinct count(*) AS c from qt_src1 where key in " +
        "('128','146','150') group by key"))

  test("qtest conformance wave 16ae: whitespace/garbage numeric " +
      "cast edges (hive-pinned) and DISTINCT-over-aggregate shapes") {
    run("cast2", "cast_to_int", "distinct_groupby")
  }
}
