package graft

/** Conformance wave: the reference's `auto_join*.q` family (map-join
  * auto-conversion over src/src1/srcpart) — ref ql/src/test/queries/
  * clientpositive/auto_join{0..27}.q with expected values transcribed
  * from results/clientpositive/llap/auto_join*.q.out.
  *
  * Porting rules: the files verify via `sum(hash(...))` over a join
  * (often staged through an INSERT OVERWRITE dest table — inlined here
  * with the dest schema's CASTs applied in the projection, since hash
  * is type-sensitive). `hash` is Hive's ObjectInspectorUtils.hashCode
  * (registered via Spark's HiveHash), which DuckDB cannot compute —
  * those cases are .q.out-pinned. The SELECT-*-shaped files keep a
  * DuckDB twin (SORT BY dropped on the twin; comparison is unordered).
  */
class QtestAutoJoinSpec extends QtestHarness {

  private def h(expected: String)(file: String, name: String, sql: String,
      note: String = "") =
    QCase(file, name, sql, duck = Some(""), hive = Some(Seq(expected)),
      note = note)

  protected val qcases: Seq[QCase] = Seq(
    h("34441656720")("auto_join0.q", "aj0",
      """select sum(hash(a.k1,a.v1,a.k2, a.v2))
        |from (
        |SELECT src1.key as k1, src1.value as v1,
        |       src2.key as k2, src2.value as v2 FROM
        |  (SELECT * FROM qt_src src WHERE src.key < 10 order by src.key, src.value) src1
        |    JOIN
        |  (SELECT * FROM qt_src src WHERE src.key < 10 order by src.key, src.value) src2
        |  SORT BY k1, v1, k2, v2
        |) a""".stripMargin,
      note = "cross join of two filtered selects (no ON)"),

    h("101861029915")("auto_join1.q", "aj1",
      """SELECT sum(hash(CAST(src1.key AS INT), src2.value))
        |FROM qt_src src1 JOIN qt_src src2 ON (src1.key = src2.key)""".stripMargin,
      note = "dest_j1_n3(key INT, value STRING) inlined"),

    h("33815990627")("auto_join2.q", "aj2",
      """SELECT sum(hash(CAST(src1.key AS INT), src3.value))
        |FROM qt_src src1 JOIN qt_src src2 ON (src1.key = src2.key)
        |JOIN qt_src src3 ON (src1.key + src2.key = src3.key)""".stripMargin,
      note = "string+string join key coerces to double in both engines"),

    h("344360994461")("auto_join3.q", "aj3",
      """SELECT sum(hash(CAST(src1.key AS INT), src3.value))
        |FROM qt_src src1 JOIN qt_src src2 ON (src1.key = src2.key)
        |JOIN qt_src src3 ON (src1.key = src3.key)""".stripMargin),

    h("5079148035")("auto_join4.q", "aj4",
      """SELECT sum(hash(CAST(c.c1 AS INT), c.c2, CAST(c.c3 AS INT), c.c4)) FROM (
        | SELECT a.c1 AS c1, a.c2 AS c2, b.c3 AS c3, b.c4 AS c4
        | FROM
        |  (SELECT src1.key AS c1, src1.value AS c2 FROM qt_src src1
        |   WHERE src1.key > 10 and src1.key < 20) a
        | LEFT OUTER JOIN
        |  (SELECT src2.key AS c3, src2.value AS c4 FROM qt_src src2
        |   WHERE src2.key > 15 and src2.key < 25) b
        | ON (a.c1 = b.c3)
        |) c""".stripMargin),

    h("9766083196")("auto_join5.q", "aj5",
      """SELECT sum(hash(CAST(c.c1 AS INT), c.c2, CAST(c.c3 AS INT), c.c4)) FROM (
        | SELECT a.c1 AS c1, a.c2 AS c2, b.c3 AS c3, b.c4 AS c4
        | FROM
        |  (SELECT src1.key AS c1, src1.value AS c2 FROM qt_src src1
        |   WHERE src1.key > 10 and src1.key < 20) a
        | RIGHT OUTER JOIN
        |  (SELECT src2.key AS c3, src2.value AS c4 FROM qt_src src2
        |   WHERE src2.key > 15 and src2.key < 25) b
        | ON (a.c1 = b.c3)
        |) c""".stripMargin),

    h("2607643291")("auto_join6.q", "aj6",
      """SELECT sum(hash(CAST(c.c1 AS INT), c.c2, CAST(c.c3 AS INT), c.c4)) FROM (
        | SELECT a.c1 AS c1, a.c2 AS c2, b.c3 AS c3, b.c4 AS c4
        | FROM
        |  (SELECT src1.key AS c1, src1.value AS c2 FROM qt_src src1
        |   WHERE src1.key > 10 and src1.key < 20) a
        | FULL OUTER JOIN
        |  (SELECT src2.key AS c3, src2.value AS c4 FROM qt_src src2
        |   WHERE src2.key > 15 and src2.key < 25) b
        | ON (a.c1 = b.c3)
        |) c""".stripMargin),

    h("-2315698213")("auto_join7.q", "aj7",
      """SELECT sum(hash(CAST(c.c1 AS INT), c.c2, CAST(c.c3 AS INT), c.c4,
        |                CAST(c.c5 AS INT), c.c6)) FROM (
        | SELECT a.c1 AS c1, a.c2 AS c2, b.c3 AS c3, b.c4 AS c4,
        |        cc.c5 AS c5, cc.c6 AS c6
        | FROM
        |  (SELECT src1.key AS c1, src1.value AS c2 FROM qt_src src1
        |   WHERE src1.key > 10 and src1.key < 20) a
        | FULL OUTER JOIN
        |  (SELECT src2.key AS c3, src2.value AS c4 FROM qt_src src2
        |   WHERE src2.key > 15 and src2.key < 25) b
        | ON (a.c1 = b.c3)
        | LEFT OUTER JOIN
        |  (SELECT src3.key AS c5, src3.value AS c6 FROM qt_src src3
        |   WHERE src3.key > 20 and src3.key < 25) cc
        | ON (a.c1 = cc.c5)
        |) c""".stripMargin,
      note = "FULL OUTER then LEFT OUTER chain, six hashed columns"),

    h("-7158439905")("auto_join8.q", "aj8",
      """SELECT sum(hash(CAST(c.c1 AS INT), c.c2, CAST(c.c3 AS INT), c.c4)) FROM (
        | SELECT a.c1 AS c1, a.c2 AS c2, b.c3 AS c3, b.c4 AS c4
        | FROM
        |  (SELECT src1.key AS c1, src1.value AS c2 FROM qt_src src1
        |   WHERE src1.key > 10 and src1.key < 20) a
        | LEFT OUTER JOIN
        |  (SELECT src2.key AS c3, src2.value AS c4 FROM qt_src src2
        |   WHERE src2.key > 15 and src2.key < 25) b
        | ON (a.c1 = b.c3)
        |) c
        |WHERE c.c3 IS NULL AND c.c1 IS NOT NULL""".stripMargin,
      note = "anti-join shape expressed as LEFT OUTER + IS NULL"),

    h("101861029915")("auto_join9.q", "aj9",
      """SELECT sum(hash(CAST(src1.key AS INT), src2.value))
        |FROM qt_srcpart src1 JOIN qt_src src2 ON (src1.key = src2.key)
        |WHERE src1.ds = '2008-04-08' and src1.hr = '12'""".stripMargin),

    h("103231310608")("auto_join10.q", "aj10",
      """SELECT sum(hash(Y.key,Y.value)) FROM
        |(SELECT src.* FROM qt_src src) x
        |JOIN
        |(SELECT src.* FROM qt_src src) Y
        |ON (x.key = Y.key)""".stripMargin),

    h("-101333194320")("auto_join11.q", "aj11",
      """SELECT sum(hash(src1.c1, src2.c4))
        |FROM
        |(SELECT src.key as c1, src.value as c2 from qt_src src) src1
        |JOIN
        |(SELECT src.key as c3, src.value as c4 from qt_src src) src2
        |ON src1.c1 = src2.c3 AND src1.c1 < 100""".stripMargin),

    h("-136843922952")("auto_join12.q", "aj12",
      """SELECT sum(hash(src1.c1, src2.c4))
        |FROM
        |(SELECT src.key as c1, src.value as c2 from qt_src src) src1
        |JOIN
        |(SELECT src.key as c3, src.value as c4 from qt_src src) src2
        |ON src1.c1 = src2.c3 AND src1.c1 < 100
        |JOIN
        |(SELECT src.key as c5, src.value as c6 from qt_src src) src3
        |ON src1.c1 = src3.c5 AND src3.c5 < 80""".stripMargin),

    h("-97670109576")("auto_join13.q", "aj13",
      """SELECT sum(hash(src1.c1, src2.c4))
        |FROM
        |(SELECT src.key as c1, src.value as c2 from qt_src src) src1
        |JOIN
        |(SELECT src.key as c3, src.value as c4 from qt_src src) src2
        |ON src1.c1 = src2.c3 AND src1.c1 < 100
        |JOIN
        |(SELECT src.key as c5, src.value as c6 from qt_src src) src3
        |ON src1.c1 + src2.c3 = src3.c5 AND src3.c5 < 200""".stripMargin,
      note = "arithmetic join key across two earlier join inputs"),

    h("404554174174")("auto_join14.q", "aj14",
      """SELECT sum(hash(CAST(src.key AS INT), srcpart.value))
        |FROM qt_src src JOIN qt_srcpart srcpart
        |ON src.key = srcpart.key AND srcpart.ds = '2008-04-08' and src.key > 100""".stripMargin,
      note = "single-side predicates inside the ON of an inner join"),

    h("524272996896")("auto_join15.q", "aj15",
      """select sum(hash(a.k1,a.v1,a.k2, a.v2))
        |from (
        |SELECT src1.key as k1, src1.value as v1, src2.key as k2, src2.value as v2
        |FROM qt_src src1 JOIN qt_src src2 ON (src1.key = src2.key)
        |SORT BY k1, v1, k2, v2
        |) a""".stripMargin),

    h("NULL")("auto_join16.q", "aj16",
      """SELECT sum(hash(subq.key, tab.value))
        |FROM
        |(select a.key, a.value from qt_src a where a.key > 10 ) subq
        |JOIN qt_src tab
        |ON (subq.key = tab.key and subq.key > 20 and subq.value = tab.value)
        |where tab.value < 200""".stripMargin,
      note = "value is never numeric-comparable < 200 -> empty -> sum NULL"),

    h("-793937029770")("auto_join17.q", "aj17",
      """SELECT sum(hash(CAST(src1.key AS INT), src1.value,
        |                CAST(src2.key AS INT), src2.value))
        |FROM qt_src src1 JOIN qt_src src2 ON (src1.key = src2.key)""".stripMargin),

    h("379685492277")("auto_join18.q", "aj18",
      """SELECT sum(hash(a.key, a.value, b.key, b.value))
        | FROM
        |  (
        |  SELECT src1.key as key, count(src1.value) AS value FROM qt_src src1 group by src1.key
        |  ) a
        | FULL OUTER JOIN
        | (
        |  SELECT src2.key as key, count(distinct(src2.value)) AS value
        |  FROM qt_src1 src2 group by src2.key
        | ) b
        | ON (a.key = b.key)""".stripMargin,
      note = "count vs count-distinct aggregates under a full outer join"),

    h("407444119660")("auto_join19.q", "aj19",
      """SELECT sum(hash(CAST(src1.key AS INT), src2.value))
        |FROM qt_srcpart src1 JOIN qt_src src2 ON (src1.key = src2.key)
        |WHERE (src1.ds = '2008-04-08' or src1.ds = '2008-04-09')
        |  and (src1.hr = '12' or src1.hr = '11')""".stripMargin),

    h("56157587016")("auto_join20.q", "aj20a",
      """select sum(hash(a.k1,a.v1,a.k2,a.v2,a.k3,a.v3))
        |from (
        |SELECT src1.key as k1, src1.value as v1, src2.key as k2, src2.value as v2,
        |       src3.key as k3, src3.value as v3
        |FROM qt_src src1 JOIN qt_src src2 ON (src1.key = src2.key AND src1.key < 10)
        |RIGHT OUTER JOIN qt_src src3 ON (src1.key = src3.key AND src3.key < 20)
        |SORT BY k1,v1,k2,v2,k3,v3
        |)a""".stripMargin,
      note = "inner-then-right-outer chain; nulls fill the left span"),

    h("56157587016")("auto_join20.q", "aj20b",
      """select sum(hash(a.k1,a.v1,a.k2,a.v2,a.k3,a.v3))
        |from (
        |SELECT src1.key as k1, src1.value as v1, src2.key as k2, src2.value as v2,
        |       src3.key as k3, src3.value as v3
        |FROM qt_src src1 JOIN qt_src src2 ON (src1.key = src2.key AND src1.key < 10 AND src2.key < 15)
        |RIGHT OUTER JOIN qt_src src3 ON (src1.key = src3.key AND src3.key < 20)
        |SORT BY k1,v1,k2,v2,k3,v3
        |)a""".stripMargin),

    h("344337359100")("auto_join22.q", "aj22",
      """SELECT sum(hash(src5.src1_value)) FROM
        |(SELECT src3.*, src4.value as src4_value, src4.key as src4_key
        | FROM qt_src src4 JOIN
        |  (SELECT src2.*, src1.key as src1_key, src1.value as src1_value
        |   FROM qt_src src1 JOIN qt_src src2 ON src1.key = src2.key) src3
        | ON src3.src1_key = src4.key) src5""".stripMargin),

    h("500")("auto_join24.q", "aj24",
      """SELECT sum(a.cnt) FROM
        |(SELECT key, CAST(count(1) AS INT) AS cnt FROM qt_src GROUP BY key) a
        |JOIN
        |(SELECT key, CAST(count(1) AS INT) AS cnt FROM qt_src GROUP BY key) b
        |ON a.key = b.key""".stripMargin,
      note = "tst1_n2 CTAS inlined; 309 distinct keys sum to 500 rows"),

    // ---- duck-twinable SELECT-shaped members of the family

    QCase("auto_join21.q", "aj21",
      """SELECT * FROM qt_src src1
        |LEFT OUTER JOIN qt_src src2 ON (src1.key = src2.key AND src1.key < 11 AND src2.key > 9)
        |RIGHT OUTER JOIN qt_src src3 ON (src2.key = src3.key AND src3.key < 10)
        |SORT BY src1.key, src1.value, src2.key, src2.value, src3.key, src3.value""".stripMargin,
      duck = Some("""SELECT * FROM qt_src src1
        |LEFT OUTER JOIN qt_src src2 ON (src1.key = src2.key AND CAST(src1.key AS DOUBLE) < 11 AND CAST(src2.key AS DOUBLE) > 9)
        |RIGHT OUTER JOIN qt_src src3 ON (src2.key = src3.key AND CAST(src3.key AS DOUBLE) < 10)""".stripMargin),
      note = "outer-join chain with asymmetric ON conditions (SORT BY " +
        "dropped on the twin; unordered compare)"),

    QCase("auto_join23.q", "aj23",
      """SELECT * FROM qt_src src1 JOIN qt_src src2
        |WHERE src1.key < 10 and src2.key < 10
        |SORT BY src1.key, src1.value, src2.key, src2.value""".stripMargin,
      duck = Some("""SELECT * FROM qt_src src1, qt_src src2
        |WHERE CAST(src1.key AS DOUBLE) < 10 and CAST(src2.key AS DOUBLE) < 10""".stripMargin),
      note = "JOIN with no ON = cross (Hive permits; DuckDB spells comma)"),

    QCase("auto_join26.q", "aj26",
      """SELECT CAST(x.key AS INT) AS key, count(1) AS cnt
        |FROM qt_src1 x JOIN qt_src y ON (x.key = y.key) group by x.key""".stripMargin,
      note = "dest_j1(key INT, cnt INT) inlined; empty src1 keys drop in " +
        "the join before the cast"),

    QCase("auto_join27.q", "aj27",
      """SELECT count(1) AS c
        |FROM
        |(
        |SELECT src.key, src.value from qt_src src
        |UNION ALL
        |SELECT DISTINCT src.key, src.value from qt_src src
        |) src_12
        |JOIN
        |(SELECT src.key as k, src.value as v from qt_src src) src3
        |ON src_12.key = src3.k AND src3.k < 200""".stripMargin,
      duck = Some("""SELECT count(1) AS c
        |FROM
        |(
        |SELECT src.key, src.value from qt_src src
        |UNION ALL
        |SELECT DISTINCT src.key, src.value from qt_src src
        |) src_12
        |JOIN
        |(SELECT src.key as k, src.value as v from qt_src src) src3
        |ON src_12.key = src3.k AND CAST(src3.k AS DOUBLE) < 200""".stripMargin)))

  test("qtest conformance: auto_join family (map-join auto-conversion " +
      "corpus) — hash-sum transcripts + duck-twinned join shapes") {
    run("auto_join")
  }
}
