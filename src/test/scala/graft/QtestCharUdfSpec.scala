package graft

/** Conformance wave 16n: functions over CHAR(n) TABLE COLUMNS — ref
  * ql/src/test/queries/clientpositive/char_udf1.q (expected cells from
  * results/clientpositive/llap/char_udf1.q.out). Hive's contract:
  * a char value reaching a function is STRIPPED (length 7, concat with
  * no pad runs), while comparisons are pad-insensitive and min/max
  * return the padded char. Stock Spark pads char columns on read, so
  * every one of these diverges without plans/CharStrippedFunctions.
  */
class QtestCharUdfSpec extends QtestHarness {

  private lazy val table: Unit = {
    Engine.sql(spark, sfDir, "DROP TABLE IF EXISTS char_udf_1")
    Engine.sql(spark, sfDir,
      "CREATE TABLE char_udf_1 (c1 string, c2 string, c3 char(10), " +
        "c4 char(20)) USING parquet")
    Engine.sql(spark, sfDir,
      "INSERT INTO char_udf_1 VALUES ('238', 'val_238', '238', 'val_238')")
  }

  protected val qcases: Seq[QCase] = Seq(
    QCase("char_udf1.q", "cu01",
      "select concat(c1, c2) AS a, concat(c3, c4) AS b, " +
        "concat(c1, c2) = concat(c3, c4) AS c from char_udf_1",
      duck = Some(""),
      hive = Some(Seq("238val_238", "238val_238", "true")),
      note = "concat over char sees STRIPPED values — no pad runs"),
    QCase("char_udf1.q", "cu02",
      "select upper(c2) AS a, upper(c4) AS b, upper(c2) = upper(c4) " +
        "AS c from char_udf_1",
      duck = Some(""), hive = Some(Seq("VAL_238", "VAL_238", "true"))),
    QCase("char_udf1.q", "cu03",
      "select lower(c2) AS a, lower(c4) AS b, lower(c2) = lower(c4) " +
        "AS c from char_udf_1",
      duck = Some(""), hive = Some(Seq("val_238", "val_238", "true"))),
    QCase("char_udf1.q", "cu04",
      "select ascii(c2) AS a, ascii(c4) AS b, ascii(c2) = ascii(c4) " +
        "AS c from char_udf_1",
      duck = Some(""), hive = Some(Seq("118", "118", "true"))),
    QCase("char_udf1.q", "cu05",
      "select concat_ws('|', c1, c2) AS a, concat_ws('|', c3, c4) AS " +
        "b, concat_ws('|', c1, c2) = concat_ws('|', c3, c4) AS c " +
        "from char_udf_1",
      duck = Some(""),
      hive = Some(Seq("238|val_238", "238|val_238", "true"))),
    QCase("char_udf1.q", "cu06",
      "select instr(c2, '_') AS a, instr(c4, '_') AS b, " +
        "instr(c2, '_') = instr(c4, '_') AS c from char_udf_1",
      duck = Some(""), hive = Some(Seq("4", "4", "true"))),
    QCase("char_udf1.q", "cu07",
      "select length(c2) AS a, length(c4) AS b, length(c2) = " +
        "length(c4) AS c from char_udf_1",
      duck = Some(""), hive = Some(Seq("7", "7", "true")),
      note = "THE divergence pin: length of a char(20) column holding " +
        "'val_238' is 7, not 20"),
    QCase("char_udf1.q", "cu08",
      "select lpad(c2, 15, ' ') AS a, lpad(c4, 15, ' ') AS b, " +
        "lpad(c2, 15, ' ') = lpad(c4, 15, ' ') AS c from char_udf_1",
      duck = Some(""),
      hive = Some(Seq("        val_238", "        val_238", "true")),
      note = "lpad pads the stripped 7-char value to 15"),
    QCase("char_udf1.q", "cu09",
      "select regexp_extract(c2, 'val_([0-9]+)', 1) AS a, " +
        "regexp_extract(c4, 'val_([0-9]+)', 1) AS b from char_udf_1",
      duck = Some(""), hive = Some(Seq("238", "238"))),
    QCase("char_udf1.q", "cu10",
      "select regexp_replace(c2, 'val', 'replaced') AS a, " +
        "regexp_replace(c4, 'val', 'replaced') AS b from char_udf_1",
      duck = Some(""),
      hive = Some(Seq("replaced_238", "replaced_238"))),
    QCase("char_udf1.q", "cu11",
      "select reverse(c2) AS a, reverse(c4) AS b, reverse(c2) = " +
        "reverse(c4) AS c from char_udf_1",
      duck = Some(""), hive = Some(Seq("832_lav", "832_lav", "true")),
      note = "reverse would lead with the pad blanks if the padding " +
        "reached the function"),
    QCase("char_udf1.q", "cu12",
      "select rpad(c2, 15, ' ') AS a, rpad(c4, 15, ' ') = " +
        "rpad(c2, 15, ' ') AS b from char_udf_1",
      duck = Some(""), hive = Some(Seq("val_238        ", "true"))),
    QCase("char_udf1.q", "cu13",
      "select trim(c2) AS a, trim(c4) AS b, trim(c2) = trim(c4) AS c " +
        "from char_udf_1",
      duck = Some(""), hive = Some(Seq("val_238", "val_238", "true"))),
    QCase("char_udf1.q", "cu14",
      "select cast(split(c4, '_') as string) AS a from char_udf_1",
      duck = Some(""), hive = Some(Seq("""["val","238"]""")),
      note = "split over the stripped value: two clean tokens, no " +
        "trailing-blank third token"),
    QCase("char_udf1.q", "cu15",
      "select min(c4) AS a, max(c4) AS b from char_udf_1",
      duck = Some(""),
      hive = Some(Seq("val_238             ", "val_238             ")),
      note = "min/max return the PADDED char (char_udf1.q.out tail)"),
    QCase("char_udf1.q", "cu16",
      "select c2 regexp 'val' AS a, c4 regexp 'val' AS b from " +
        "char_udf_1",
      duck = Some(""), hive = Some(Seq("true", "true"))))

  test("qtest conformance: char-column function arguments see the " +
      "stripped value (char_udf1.q)") {
    table
    run("char_udf1")
  }
}
