package graft

/** Conformance wave 16am: full-outer-join edge semantics — one-sided
  * literal conditions in the ON (the HIVE-21930 unexpected-rows
  * scenario) and partition conditions in a full-outer ON with
  * both-side WHERE filters (ref ql/src/test/queries/clientpositive/
  * outer_join_unexpected_rows.q, outer_join_ppr.q).
  */
class QtestOuterJoinWave16amSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("outer_join_unexpected_rows.q", "am01",
      "with t_y as (select col1 as id, col2 as s from (VALUES (0, " +
        "'a'), (1, 'y')) as c), t_xy as (select col1 as id, col2 as " +
        "s from (VALUES (1, 'x'), (1, 'y')) as c) select * from " +
        "t_xy l full outer join t_y r on (l.id = r.id and l.s = 'y')",
      duck = Some("with t_y as (select col1 as id, col2 as s from " +
        "(VALUES (0, 'a'), (1, 'y')) as c(col1, col2)), t_xy as " +
        "(select col1 as id, col2 as s from (VALUES (1, 'x'), (1, " +
        "'y')) as c(col1, col2)) select * from t_xy l full outer " +
        "join t_y r on (l.id = r.id and l.s = 'y')",
      ),
      note = "a LEFT-side literal condition in a FULL OUTER ON: the " +
        "failing left row ((1,'x')) must still appear NULL-extended, " +
        "and the right rows it would have matched appear separately " +
        "(the HIVE-21930 scenario)"),
    QCase("outer_join_unexpected_rows.q", "am02",
      "select * from (VALUES (1, 'x'), (1, 'y')) AS l(id, s) full " +
        "outer join (VALUES (0, 'a'), (1, 'y'), (1, 'x')) AS r(id, " +
        "s2) on (l.id = r.id and l.s = 'y')",
      note = "the widened right side: the 'y' left row matches BOTH " +
        "id=1 right rows; the 'x' left row NULL-extends"),
    QCase("outer_join_ppr.q", "am03",
      "SELECT a.key, a.value, b.key AS k2, b.value AS v2 FROM " +
        "qt_src a FULL OUTER JOIN qt_srcpart b ON (a.key = b.key " +
        "AND b.ds = '2008-04-08') WHERE a.key > 10 AND a.key < 20 " +
        "AND b.key > 15 AND b.key < 25",
      duck = Some("SELECT a.key, a.value, b.key AS k2, b.value AS " +
        "v2 FROM qt_src a FULL OUTER JOIN qt_srcpart b ON (a.key = " +
        "b.key AND b.ds = '2008-04-08') WHERE CAST(a.key AS int) > " +
        "10 AND CAST(a.key AS int) < 20 AND CAST(b.key AS int) > " +
        "15 AND CAST(b.key AS int) < 25"),
      note = "both-side WHERE filters after a full outer reduce it " +
        "to an inner join over the partition-restricted right side"))

  test("qtest conformance wave 16am: full-outer one-sided ON " +
      "literals and partition conditions with both-side filters") {
    run("outer_join_unexpected_rows", "outer_join_ppr")
  }
}
