package graft

/** Conformance wave 16t: functions over VARCHAR(n) table columns — ref
  * ql/src/test/queries/clientpositive/varchar_udf1.q. The contrast with
  * char_udf1: varchar PRESERVES the value byte-for-byte (trailing
  * spaces included), so functions see exactly what was stored and the
  * engine's char-stripping rewrite must NOT touch varchar attributes.
  */
class QtestVarcharUdfSpec extends QtestHarness {

  private lazy val table: Unit = {
    Engine.sql(spark, sfDir, "DROP TABLE IF EXISTS varchar_udf_1")
    Engine.sql(spark, sfDir,
      "CREATE TABLE varchar_udf_1 (c1 string, c2 varchar(10), " +
        "c3 varchar(20)) USING parquet")
    Engine.sql(spark, sfDir,
      "INSERT INTO varchar_udf_1 VALUES ('val_238', 'val_238', " +
        "'val_238  ')")
  }

  protected val qcases: Seq[QCase] = Seq(
    QCase("varchar_udf1.q", "vu01",
      "select length(c1) AS a, length(c2) AS b, length(c3) AS c " +
        "from varchar_udf_1",
      duck = Some(""),
      hive = Some(Seq("7", "7", "9")),
      note = "varchar length counts STORED characters — c3's two " +
        "trailing spaces are real (char would strip them)"),
    QCase("varchar_udf1.q", "vu02",
      "select concat(c2, '|') AS a, concat(c3, '|') AS b " +
        "from varchar_udf_1",
      duck = Some(""),
      hive = Some(Seq("val_238|", "val_238  |")),
      note = "concat preserves varchar trailing spaces"),
    QCase("varchar_udf1.q", "vu03",
      "select upper(c2) AS a, lower(c2) AS b, reverse(c2) AS c " +
        "from varchar_udf_1",
      duck = Some(""),
      hive = Some(Seq("VAL_238", "val_238", "832_lav"))),
    QCase("varchar_udf1.q", "vu04",
      "select c1 = c2 AS a, c2 = c3 AS b, trim(c3) = c2 AS c " +
        "from varchar_udf_1",
      duck = Some(""),
      hive = Some(Seq("true", "false", "true")),
      note = "varchar comparison is exact — 'val_238' <> 'val_238  ' " +
        "(char comparison would pad-ignore); trim restores equality"),
    QCase("varchar_udf1.q", "vu05",
      "select cast(c2 as varchar(3)) AS a, " +
        "cast('abcdef' as varchar(3)) AS b from varchar_udf_1",
      duck = Some(""),
      hive = Some(Seq("val", "abc")),
      note = "cast to a shorter varchar TRUNCATES"))

  test("qtest conformance: varchar columns preserve stored values " +
      "through functions (varchar_udf1.q)") {
    table
    run("varchar_udf1")
  }
}
