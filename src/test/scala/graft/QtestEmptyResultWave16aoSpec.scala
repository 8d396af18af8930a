package graft

/** Conformance wave 16ao: provably-empty results and str_to_map over
  * UTF-8 + duplicated keys (ref ql/src/test/queries/clientpositive/
  * empty_result.q, str_to_map_utf8.q — HIVE-28728). The duplicate-key
  * case pins the r16 LAST_WIN map-dedup conf (Hive's LinkedHashMap
  * semantics; Spark's default throws DUPLICATED_MAP_KEY).
  */
class QtestEmptyResultWave16aoSpec extends QtestHarness {

  private val t12 = "(VALUES (1, 20), (2, 30)) AS t1(a1, b1)"

  protected val qcases: Seq[QCase] = Seq(
    QCase("empty_result.q", "ao01",
      s"select a1 from $t12 join (select a2 from (VALUES (1)) " +
        s"t2(a2) where 1 = 0) s on s.a2 = t1.a1",
      note = "a constant-false subquery side folds the join to empty"),
    QCase("empty_result.q", "ao02",
      s"select y + 1 AS y1 from (select a1 y, b1 z from $t12 where " +
        s"b1 > 10) q WHERE 1=0",
      note = "constant-false above a live subquery still answers " +
        "zero rows, not an error"),
    QCase("str_to_map_utf8.q", "ao03",
      "SELECT id, element_at(STR_TO_MAP(multi, ',', ':'), " +
        "element_at(map_keys(STR_TO_MAP(multi, ',', ':')), 1)) AS " +
        "v1, size(STR_TO_MAP(multi, ',', ':')) AS n FROM (VALUES " +
        "('100', 'en:1'), ('300', 'a:1,b:2'), ('400', " +
        "'ascii:值'), ('500', '上海:北京," +
        "优惠活动:折扣')) t(id, multi)",
      duck = Some("SELECT * FROM (VALUES ('100', '1', 1), ('300', " +
        "'1', 2), ('400', '值', 1), ('500', '北京', " +
        "2)) t(id, v1, n)"),
      note = "str_to_map over UTF-8 keys and values; first-key " +
        "lookups and entry counts projected so both engines render " +
        "scalars"),
    QCase("str_to_map_utf8.q", "ao04",
      "SELECT element_at(STR_TO_MAP('val:1,val:2', ',', ':'), " +
        "'val') AS v, size(STR_TO_MAP('val:1,val:2', ',', ':')) AS n",
      duck = Some(""),
      hive = Some(Seq("2", "1")),
      note = "a DUPLICATED key keeps the LAST value " +
        "(GenericUDFStringToMap's LinkedHashMap — the engine pins " +
        "spark.sql.mapKeyDedupPolicy=LAST_WIN; stock Spark throws)"))

  test("qtest conformance wave 16ao: constant-false empty results " +
      "and str_to_map UTF-8/duplicate-key semantics") {
    run("empty_result", "str_to_map_utf8")
  }
}
