package graft

/** Conformance wave 16ai: UDTF corpus remainder — stack() ragged
  * fills, NULL arguments and mixed types, json_tuple over NULL
  * documents (ref ql/src/test/queries/clientpositive/udtf_stack.q,
  * udtf_json_tuple.q).
  */
class QtestUdtfWave16aiSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("udtf_stack.q", "ai01",
      "SELECT x, element_at(y, 1) AS y0 FROM (select 1 AS one) s " +
        "LATERAL VIEW STACK(2, 'x', array(1), 'z') a AS x, y",
      duck = Some("SELECT * FROM (VALUES ('x', 1), ('z', CAST(NULL " +
        "AS int))) t(x, y0)"),
      note = "an odd argument count over n=2 rows leaves the ragged " +
        "tail cell NULL"),
    QCase("udtf_stack.q", "ai02",
      "SELECT x, element_at(y, 1) AS y0 FROM (select 1 AS one) s " +
        "LATERAL VIEW STACK(2, 'x', array(1), 'z', array(4)) a AS " +
        "x, y",
      duck = Some("SELECT * FROM (VALUES ('x', 1), ('z', 4)) " +
        "t(x, y0)")),
    QCase("udtf_stack.q", "ai03",
      "SELECT stack(1, 'en', 'dbpedia', NULL) AS (c1, c2, c3)",
      duck = Some(""),
      hive = Some(Seq("en", "dbpedia", "NULL")),
      note = "a NULL literal is a legal stack cell"),
    QCase("udtf_stack.q", "ai04",
      "SELECT STACK(2, 'a', 'b', 'c', 'd', 'e') AS (c1, c2, c3)",
      duck = Some("SELECT * FROM (VALUES ('a', 'b', 'c'), ('d', " +
        "'e', CAST(NULL AS varchar))) t(c1, c2, c3)"),
      note = "five values over two 3-column rows: the last cell " +
        "fills NULL"),
    QCase("udtf_json_tuple.q", "ai05",
      "select key, c0, c1, c2 from (VALUES ('1', '{\"f1\": " +
        "\"value1\", \"f2\": \"value2\", \"f3\": 3}'), ('4', " +
        "cast(null as string)), ('5', '')) AS json_t(key, jstring) " +
        "lateral view json_tuple(jstring, 'f1', 'f2', 'f3') jt as " +
        "c0, c1, c2",
      duck = Some("SELECT * FROM (VALUES ('1', 'value1', 'value2', " +
        "'3'), ('4', CAST(NULL AS varchar), CAST(NULL AS varchar), " +
        "CAST(NULL AS varchar)), ('5', CAST(NULL AS varchar), " +
        "CAST(NULL AS varchar), CAST(NULL AS varchar))) t(key, c0, " +
        "c1, c2)"),
      note = "json_tuple over NULL or empty documents answers a " +
        "row of NULLs — the source row is never dropped"))

  test("qtest conformance wave 16ai: stack ragged fills and NULL " +
      "cells, json_tuple over NULL documents") {
    run("udtf_stack", "udtf_json_tuple")
  }
}
