package graft.plans

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.types.{ByteType, LongType}

/** Round-17 hardening of the explicit-() grouping-set rewrite and the
  * MAP GROUP BY canonicalization (the r16 ADVICE items):
  *
  *   - aggregate calls in the global leg are detected through the
  *     session FunctionRegistry, not a name whitelist — max_by/min_by/
  *     any_value keep their raw grouping-column arguments instead of
  *     silently aggregating NULL;
  *   - grouping-expression matching is qualifier-stripped and
  *     case-insensitive (`t.a` in the select list matches group key
  *     `a`);
  *   - grouping()/grouping_id() fold to TINYINT/BIGINT literals so the
  *     Union does not widen the output type vs un-rewritten plans;
  *   - a map whose VALUE type is non-orderable stays un-rewritten and
  *     surfaces Spark's stock orderability error, not a sort_array
  *     type error.
  */
class EmptyGroupingSetsAdviceSpec extends SparkSpec {

  test("non-whitelist aggregates (max_by) keep raw grouping-column " +
      "args in the explicit-() global leg") {
    val rows = Engine.sql(spark, sfDir,
      """SELECT max_by(v, k) AS m, sum(v) AS s, grouping(k) AS g
        |FROM (VALUES (1, 10), (2, 20), (3, 5)) t(k, v)
        |GROUP BY k GROUPING SETS ((), (k))
        |ORDER BY g, m""".stripMargin).collect()
    // () row: max_by over the whole input — v of the largest k (= 5),
    // NOT NULL (the r16 whitelist folded k to Literal(null))
    val global = rows.filter(_.getAs[Number]("g").intValue == 1)
    assert(global.length === 1)
    assert(global.head.getAs[Int]("m") === 5)
    assert(global.head.getAs[Long]("s") === 35L)
    // per-k rows unchanged
    assert(rows.count(_.getAs[Number]("g").intValue == 0) === 3)
  }

  test("explicit-() global row over EMPTY input with a registry-" +
      "detected aggregate") {
    val rows = Engine.sql(spark, sfDir,
      """SELECT max_by(v, k) AS m, grouping(k) AS g
        |FROM (VALUES (1, 10)) t(k, v) WHERE k < 0
        |GROUP BY k GROUPING SETS ((), (k))""".stripMargin).collect()
    assert(rows.length === 1)
    assert(rows.head.isNullAt(0))
    assert(rows.head.getAs[Number]("g").intValue === 1)
  }

  test("qualified select-list spelling (t.k) matches GROUP BY k in " +
      "the global leg") {
    val rows = Engine.sql(spark, sfDir,
      """SELECT t.k AS k, sum(t.v) AS s, grouping(k) AS g
        |FROM (VALUES (1, 10), (1, 20), (2, 5)) t(k, v)
        |GROUP BY k GROUPING SETS ((), (k))
        |ORDER BY g, k NULLS LAST""".stripMargin).collect()
    val global = rows.filter(_.getAs[Number]("g").intValue == 1)
    assert(global.length === 1)
    assert(global.head.isNullAt(0)) // t.k folds to NULL in the () row
    assert(global.head.getAs[Long]("s") === 35L)
  }

  test("grouping() stays TINYINT and grouping_id() BIGINT through " +
      "the rewrite's Union (no literal-driven widening)") {
    val df = Engine.sql(spark, sfDir,
      """SELECT grouping(k) AS g, grouping_id() AS gid, count(*) AS c
        |FROM (VALUES (1, 10)) t(k, v)
        |GROUP BY k GROUPING SETS ((), (k))""".stripMargin)
    assert(df.schema("g").dataType === ByteType)
    assert(df.schema("gid").dataType === LongType)
    // un-rewritten rollup spelling types identically
    val plain = Engine.sql(spark, sfDir,
      """SELECT grouping(k) AS g, grouping_id() AS gid, count(*) AS c
        |FROM (VALUES (1, 10)) t(k, v) GROUP BY ROLLUP(k)""".stripMargin)
    assert(plain.schema("g").dataType === ByteType)
    assert(plain.schema("gid").dataType === LongType)
  }

  // Map GROUP BY is Spark-native on 4.x (InsertMapSortInGrouping-
  // Expressions); the r17 removal of the hand-rolled canonicalization
  // must not regress either shape — including the nested-value map the
  // r16 rewrite could not express (Hive groups such maps too).
  test("map GROUP BY with a NESTED map value works natively through " +
      "the front door") {
    val rows = Engine.sql(spark, sfDir,
      """SELECT map_keys(m)[0] AS k, count(*) AS c
        |FROM (SELECT map('a', map('x', x % 2)) AS m
        |      FROM (VALUES (1), (2), (3)) t(x)) s
        |GROUP BY m ORDER BY c""".stripMargin).collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[Long]("c")).toSeq === Seq(1L, 2L))
  }

  test("orderable-value map GROUP BY groups on map equality " +
      "(regression after removing the r16 rewrite)") {
    val rows = Engine.sql(spark, sfDir,
      """SELECT m, count(*) AS c
        |FROM (SELECT map('a', x % 2) AS m FROM (VALUES (1), (2), (3),
        |  (4)) t(x)) s
        |GROUP BY m ORDER BY c""".stripMargin).collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[Long]("c")).toSeq === Seq(2L, 2L))
  }

  test("map GROUP BY is entry-order-insensitive (Hive map equality)") {
    val rows = Engine.sql(spark, sfDir,
      """SELECT count(*) AS c
        |FROM (SELECT CASE WHEN x = 1 THEN map('a', 1, 'b', 2)
        |                  ELSE map('b', 2, 'a', 1) END AS m
        |      FROM (VALUES (1), (2)) t(x)) s
        |GROUP BY m""".stripMargin).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("c") === 2L)
  }
}
