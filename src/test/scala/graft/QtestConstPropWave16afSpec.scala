package graft

/** Conformance wave 16af: constant-propagation corpus results —
  * three-valued simple/searched CASE over NULL pairs, LIMIT binding on
  * a constant union, and datetime arithmetic folded through a CASE
  * (ref ql/src/test/queries/clientpositive/constantPropWhen.q,
  * constant_prop_1.q, constant_prop_coalesce.q).
  */
class QtestConstPropWave16afSpec extends QtestHarness {

  private val t4 = "(VALUES (123, CAST(NULL AS INT)), (CAST(NULL AS " +
    "INT), CAST(NULL AS INT)), (CAST(NULL AS INT), 123), (123, 123)) " +
    "AS t(id, id2)"

  protected val qcases: Seq[QCase] = Seq(
    QCase("constantPropWhen.q", "af01",
      s"SELECT cast(CASE WHEN id = id2 THEN FALSE ELSE TRUE END AS " +
        s"BOOLEAN) AS b FROM $t4",
      note = "searched CASE: a NULL comparison falls to ELSE, so " +
        "NULL pairs answer TRUE"),
    QCase("constantPropWhen.q", "af02",
      s"SELECT cast(CASE id when id2 THEN FALSE ELSE TRUE END AS " +
        s"BOOLEAN) AS b FROM $t4",
      note = "simple CASE matches by equality, NOT null-safe " +
        "equality: CASE NULL WHEN NULL falls to ELSE too"),
    QCase("constantPropWhen.q", "af03",
      s"SELECT cast(CASE WHEN id = id2 THEN TRUE ELSE FALSE END AS " +
        s"BOOLEAN) AS b FROM $t4"),
    QCase("constantPropWhen.q", "af04",
      s"SELECT cast(CASE id when id2 THEN TRUE ELSE FALSE END AS " +
        s"BOOLEAN) AS b FROM $t4"),
    QCase("constant_prop_1.q", "af05",
      "select 1 as a from qt_src union all select 1 as a from " +
        "qt_src limit 1",
      duck = Some(""),
      hive = Some(Seq("1")),
      note = "the trailing LIMIT binds to the WHOLE union, not the " +
        "second leg"),
    QCase("constant_prop_coalesce.q", "af06",
      "select case when b.a=1 then cast(from_unixtime(" +
        "unix_timestamp(cast(20210309 as string), 'yyyyMMdd') - " +
        "86400, 'yyyyMMdd') as bigint) else 20210309 end AS d from " +
        "(select 1 as a) b",
      duck = Some(""),
      hive = Some(Seq("20210308")),
      note = "int -> string -> seconds -> minus-a-day -> formatted " +
        "date chain folds to the previous day"))

  test("qtest conformance wave 16af: three-valued CASE forms, union " +
      "LIMIT binding, folded datetime arithmetic") {
    run("constantPropWhen", "constant_prop_1", "constant_prop_coalesce")
  }
}
