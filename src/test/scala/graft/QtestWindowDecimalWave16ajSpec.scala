package graft

/** Conformance wave 16aj: windowing + decimal corpus remainder —
  * forward-only frames running off the partition tail, RANGE frames
  * under multi-key ordering, and trig domain edges over decimal
  * inputs (the acos/asin NULL-outside-[-1,1] pin, UDFAcos.java:48 —
  * the r16 registry fix; ref ql/src/test/queries/clientpositive/
  * windowing_sum_following_null.q, windowing_range_multiorder.q,
  * decimal_udf2.q).
  */
class QtestWindowDecimalWave16ajSpec extends QtestHarness {

  private val swt = "(VALUES (3, 17.1), (4, 14.1), (6, 18.1), " +
    "(7, 19.1), (8, CAST(NULL AS DOUBLE)), (10, CAST(NULL AS " +
    "DOUBLE)), (11, 22.0)) AS t(id, double_col)"

  protected val qcases: Seq[QCase] = Seq(
    QCase("windowing_sum_following_null.q", "aj01",
      s"select id, double_col, sum(double_col) over (order by id " +
        s"rows between 1 following and 2 following) AS s from $swt " +
        s"order by id",
      ordered = true,
      note = "a FOLLOWING-only frame: NULL cells skip inside the " +
        "frame, and the last row's EMPTY frame answers NULL, not 0"),
    QCase("windowing_range_multiorder.q", "aj02",
      "select s, si, i, avg(i) over (partition by s order by si, i " +
        "range between unbounded preceding and current row) AS a " +
        "from qt_over10k where s = 'tom allen' or s = 'bob steinbeck'",
      note = "RANGE with a MULTI-KEY order: current-row peers are " +
        "rows equal on BOTH keys (unbounded-to-current is the one " +
        "multi-key RANGE frame both engines admit)"),
    QCase("windowing_range_multiorder.q", "aj03",
      "select s, si, rank() over (partition by s order by si desc, " +
        "i desc) AS r from qt_over10k where s = 'tom allen' or s = " +
        "'bob steinbeck'",
      note = "rank under a two-key descending order"),
    QCase("decimal_udf2.q", "aj04",
      "SELECT acos(key) AS c1, asin(key) AS c2, atan(key) AS c3, " +
        "cos(key) AS c4, sin(key) AS c5, tan(key) AS c6, " +
        "radians(key) AS c7 FROM (VALUES (CAST(10 AS " +
        "decimal(20,10)))) t(key) WHERE key = 10",
      duck = Some(""),
      hive = Some(Seq("NULL", "NULL", "1.4711276743037347",
        "-0.8390715290764524", "-0.5440211108893698",
        "0.6483608274590866", "0.17453292519943295")),
      note = "acos/asin answer NULL outside [-1,1] (UDFAcos.java:48) " +
        "where stock Spark answers NaN — the r16 registry guard; " +
        "the in-domain trig values match bit-for-bit"),
    QCase("decimal_udf2.q", "aj05",
      "SELECT acos(key) AS c1, asin(key) AS c2, atan(key) AS c3 " +
        "FROM (VALUES (CAST(-0.5 AS decimal(20,10)))) t(key)",
      duck = Some("SELECT acos(key) AS c1, asin(key) AS c2, " +
        "atan(key) AS c3 FROM (VALUES (CAST(-0.5 AS " +
        "decimal(20,10)))) t(key)"),
      note = "in-domain decimal trig agrees with DuckDB exactly"))

  test("qtest conformance wave 16aj: following-only frames, " +
      "multi-key RANGE windows, trig domain NULLs over decimals") {
    run("windowing_sum_following_null", "windowing_range_multiorder",
      "decimal_udf2")
  }
}
