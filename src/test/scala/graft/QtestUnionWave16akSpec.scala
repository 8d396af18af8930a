package graft

/** Conformance wave 16ak: union TYPE-UNIFICATION remainder — mixed
  * DOUBLE/BIGINT legs unify to double in either order, CHAR/VARCHAR
  * legs unify with STRING, and a join-fed leg unions with a plain one
  * (ref ql/src/test/queries/clientpositive/union32.q, union19.q,
  * union28.q). t1/t2 are the .q's key<10 CTAS copies, spelled as
  * subqueries over the same source.
  */
class QtestUnionWave16akSpec extends QtestHarness {

  private val t1 = "(SELECT * FROM qt_src WHERE CAST(key AS int) < 10)"

  protected val qcases: Seq[QCase] = Seq(
    QCase("union32.q", "ak01",
      s"SELECT * FROM (SELECT CAST(key AS DOUBLE) AS key FROM $t1 " +
        s"t1 UNION ALL SELECT CAST(key AS BIGINT) AS key FROM $t1 " +
        s"t2) a",
      note = "DOUBLE and BIGINT legs unify to DOUBLE; the bigint " +
        "leg's values render with the double's .0"),
    QCase("union32.q", "ak02",
      s"SELECT * FROM (SELECT CAST(a.key AS BIGINT) AS key FROM $t1 " +
        s"a JOIN $t1 b ON a.key = b.key UNION ALL SELECT CAST(key " +
        s"AS DOUBLE) AS key FROM $t1 t2) a",
      note = "a join-fed BIGINT leg first: same unification, join " +
        "multiplicity preserved"),
    QCase("union32.q", "ak03",
      s"SELECT * FROM (SELECT CAST(key AS DOUBLE) AS key FROM $t1 " +
        s"t2 UNION ALL SELECT CAST(a.key AS BIGINT) AS key FROM $t1 " +
        s"a JOIN $t1 b ON a.key = b.key) a",
      note = "leg order flipped: unification is symmetric"),
    QCase("union32.q", "ak04",
      s"SELECT * FROM (SELECT CAST(a.key AS BIGINT) AS key, " +
        s"CAST(b.key AS VARCHAR(20)) AS value FROM $t1 a JOIN $t1 b " +
        s"ON a.key = b.key UNION ALL SELECT CAST(key AS DOUBLE) AS " +
        s"key, CAST(key AS STRING) AS value FROM $t1 t2) a",
      note = "VARCHAR and STRING legs unify to STRING alongside the " +
        "numeric unification"),
    QCase("union19.q", "ak05",
      "SELECT unionsrc.key, count(unionsrc.value) AS c FROM (select " +
        "'tst1' as key, cast(count(1) as string) as value from " +
        "qt_src s1 UNION ALL select s2.key as key, s2.value as " +
        "value from qt_src s2) unionsrc group by unionsrc.key",
      note = "an aggregate over a union whose first leg is itself a " +
        "global aggregate (the count-of-counts shape)"),
    QCase("union28.q", "ak06",
      "select key, value from (select key, value from qt_src where " +
        "CAST(key AS int) < 10 union all select key, value from " +
        "(select key, value, count(1) from qt_src where CAST(key AS " +
        "int) < 10 group by key, value) subq) a",
      duck = Some("select key, value from (select key, value from " +
        "qt_src where CAST(key AS int) < 10 union all select key, " +
        "value from (select key, value, count(1) AS c from qt_src " +
        "where CAST(key AS int) < 10 group by key, value) subq) a"),
      note = "a grouped subquery leg projects away its count " +
        "(DuckDB requires the alias; Hive tolerates the anonymous " +
        "aggregate column)"))

  test("qtest conformance wave 16ak: union type unification " +
      "(double/bigint, varchar/string), aggregate-over-union, " +
      "grouped subquery legs") {
    run("union32", "union19", "union28")
  }
}
