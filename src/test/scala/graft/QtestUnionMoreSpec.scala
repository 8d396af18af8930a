package graft

/** Qtest conformance, union-family remainder: `union4..27` beyond the
  * union2/3/5/7 cases already in QtestConformanceSpec. The corpus' INSERT
  * OVERWRITE + SELECT-back scaffolding ports to the bare SELECT
  * (QtestConformanceSpec porting rules); `srcbucket` in union12 stands in
  * as a third src scan (the case tests 3-way aggregate unions, not
  * bucketing).
  */
class QtestUnionMoreSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("union4.q", "u4",
      """SELECT unionsrc.key, unionsrc.value FROM (
        |  SELECT 'tst1' AS key, count(1) AS value FROM qt_src s1
        |  UNION ALL
        |  SELECT 'tst2' AS key, count(1) AS value FROM qt_src s2
        |) unionsrc""".stripMargin,
      note = "union of two map-reduce (aggregate) subqueries"),
    QCase("union6.q", "u6",
      """SELECT unionsrc.key, unionsrc.value FROM (
        |  SELECT 'tst1' AS key, CAST(count(1) AS STRING) AS value
        |  FROM qt_src s1
        |  UNION ALL
        |  SELECT s2.key AS key, s2.value AS value FROM qt_src1 s2
        |) unionsrc""".stripMargin,
      note = "aggregate branch unioned with a plain-scan branch"),
    QCase("union8.q", "u8",
      """SELECT unionsrc.key, unionsrc.value FROM (
        |  SELECT s1.key AS key, s1.value AS value FROM qt_src s1
        |  UNION ALL
        |  SELECT s2.key AS key, s2.value AS value FROM qt_src s2
        |  UNION ALL
        |  SELECT s3.key AS key, s3.value AS value FROM qt_src s3
        |) unionsrc""".stripMargin),
    QCase("union9.q", "u9",
      """SELECT count(1) AS c FROM (
        |  SELECT s1.key AS key, s1.value AS value FROM qt_src s1
        |  UNION ALL
        |  SELECT s2.key AS key, s2.value AS value FROM qt_src s2
        |  UNION ALL
        |  SELECT s3.key AS key, s3.value AS value FROM qt_src s3
        |) unionsrc""".stripMargin),
    QCase("union10.q", "u10",
      """SELECT unionsrc.key, unionsrc.value FROM (
        |  SELECT 'tst1' AS key, count(1) AS value FROM qt_src s1
        |  UNION ALL
        |  SELECT 'tst2' AS key, count(1) AS value FROM qt_src s2
        |  UNION ALL
        |  SELECT 'tst3' AS key, count(1) AS value FROM qt_src s3
        |) unionsrc""".stripMargin),
    QCase("union11.q", "u11",
      """SELECT unionsrc.key, count(1) AS c FROM (
        |  SELECT 'tst1' AS key, count(1) AS value FROM qt_src s1
        |  UNION ALL
        |  SELECT 'tst2' AS key, count(1) AS value FROM qt_src s2
        |  UNION ALL
        |  SELECT 'tst3' AS key, count(1) AS value FROM qt_src s3
        |) unionsrc GROUP BY unionsrc.key""".stripMargin),
    QCase("union12.q", "u12",
      """SELECT unionsrc.key, unionsrc.value FROM (
        |  SELECT 'tst1' AS key, count(1) AS value FROM qt_src s1
        |  UNION ALL
        |  SELECT 'tst2' AS key, count(1) AS value FROM qt_src1 s2
        |  UNION ALL
        |  SELECT 'tst3' AS key, count(1) AS value FROM qt_srcpart s3
        |) unionsrc""".stripMargin,
      note = "three DIFFERENT tables' counts (srcbucket -> srcpart)"),
    QCase("union14.q", "u14",
      """SELECT unionsrc.key, count(1) AS c FROM (
        |  SELECT s2.key AS key, s2.value AS value FROM qt_src1 s2
        |  UNION ALL
        |  SELECT 'tst1' AS key, CAST(count(1) AS STRING) AS value
        |  FROM qt_src s1
        |) unionsrc GROUP BY unionsrc.key""".stripMargin),
    QCase("union15.q", "u15",
      """SELECT unionsrc.key, count(1) AS c FROM (
        |  SELECT 'tst1' AS key, CAST(count(1) AS STRING) AS value
        |  FROM qt_src s1
        |  UNION ALL
        |  SELECT s2.key AS key, s2.value AS value FROM qt_src1 s2
        |  UNION ALL
        |  SELECT s3.key AS key, s3.value AS value FROM qt_src1 s3
        |) unionsrc GROUP BY unionsrc.key""".stripMargin),
    QCase("union16.q", "u16",
      "SELECT count(1) AS c FROM (" +
        (1 to 25).map(_ => "SELECT key, value FROM qt_src")
          .mkString(" UNION ALL ") + ") src",
      note = "25-way UNION ALL of the same scan"),
    QCase("union17.q", "u17a",
      """SELECT unionsrc.key, count(DISTINCT substr(unionsrc.value, 5)) AS c
        |FROM (
        |  SELECT 'tst1' AS key, CAST(count(1) AS STRING) AS value
        |  FROM qt_src s1
        |  UNION ALL
        |  SELECT s2.key AS key, s2.value AS value FROM qt_src s2
        |) unionsrc GROUP BY unionsrc.key""".stripMargin,
      note = "DEST1 leg of the multi-insert: count(DISTINCT) over a union"),
    QCase("union17.q", "u17b",
      """SELECT unionsrc.key, unionsrc.value,
        |  count(DISTINCT substr(unionsrc.value, 5)) AS c
        |FROM (
        |  SELECT 'tst1' AS key, CAST(count(1) AS STRING) AS value
        |  FROM qt_src s1
        |  UNION ALL
        |  SELECT s2.key AS key, s2.value AS value FROM qt_src s2
        |) unionsrc GROUP BY unionsrc.key, unionsrc.value""".stripMargin),
    QCase("union20.q", "u20",
      """SELECT unionsrc1.key AS k1, unionsrc1.value AS v1,
        |  unionsrc2.key AS k2, unionsrc2.value AS v2
        |FROM (
        |  SELECT 'tst1' AS key, CAST(count(1) AS STRING) AS value
        |  FROM qt_src s1
        |  UNION ALL
        |  SELECT s2.key AS key, s2.value AS value FROM qt_src s2
        |  WHERE CAST(s2.key AS INT) < 10
        |) unionsrc1
        |JOIN (
        |  SELECT 'tst1' AS key, CAST(count(1) AS STRING) AS value
        |  FROM qt_src s3
        |  UNION ALL
        |  SELECT s4.key AS key, s4.value AS value FROM qt_src s4
        |  WHERE CAST(s4.key AS INT) < 10
        |) unionsrc2 ON (unionsrc1.key = unionsrc2.key)""".stripMargin,
      note = "join of two unions (key < 10 spelled with the explicit CAST " +
        "the porting rules require)"),
    QCase("union25.q", "u25",
      """SELECT count(1) AS counts, key, value FROM (
        |  SELECT key, value FROM qt_srcpart a
        |  WHERE a.ds = '2008-04-08' AND a.hr = '11'
        |  UNION ALL
        |  SELECT key, key AS value FROM (
        |    SELECT DISTINCT key FROM (
        |      SELECT key, value FROM qt_srcpart a
        |      WHERE a.ds = '2008-04-08' AND a.hr = '11'
        |      UNION ALL
        |      SELECT key, value FROM qt_srcpart b
        |      WHERE b.ds = '2008-04-08' AND b.hr = '11'
        |    ) t
        |  ) master_table
        |) a GROUP BY key, value""".stripMargin,
      note = "nested union + DISTINCT under an outer grouped union (the " +
        "tmp_srcpart copy is the same partition slice)"),
    QCase("union27.q", "u27",
      """SELECT b.key, b.value FROM qt_src a JOIN (
        |  SELECT * FROM qt_src UNION ALL SELECT * FROM qt_src
        |) b ON a.key = b.key AND b.key = '97'""".stripMargin,
      note = "jackson_sev tables are src copies; constant-key join " +
        "against a union"))

  test("qtest conformance: union-family remainder (aggregate branches, " +
      "25-way, joins of unions, nested distinct)") {
    run("union")
  }
}
