package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Engine
import QDef.q

/** Relational-core operator coverage (SURVEY §2.1): scan/filter/project,
  * hash aggregation, every join flavor, set operations, grouping sets,
  * window functions, subqueries, CTEs, limits, sampling, UDTF/lateral view.
  *
  * Implementation is DataFrame-API-first so Catalyst owns the physical
  * strategy (broadcast vs shuffle join, partial aggregation, top-N pushdown);
  * `spark.sql` is used only where the SQL surface itself is the feature under
  * test (grouping sets, subqueries, CTE, VALUES, LATERAL VIEW).
  */
object CoreQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(spark, dir, name)

  // Spark-leg SQL runs with the same per-engine money respell as the
  // t-queries (TpchQueries.sparkMoney, r18): CAST(col AS DECIMAL(p,s)) →
  // codegen'd money_decimal(col, p, s); the oracle string keeps the portable
  // CAST, so the oracle gate re-proves value-equality on every run.
  private def sqlQ(sql: String): (SparkSession, String) => DataFrame =
    (spark, dir) => {
      Engine.register(spark, dir); spark.sql(TpchQueries.sparkMoney(sql))
    }

  val defs: Seq[QDef] = Seq(

    // --- scan / filter / project / aggregate -------------------------------
    // TPC-H Q1 shape: scan -> filter (pushed to parquet) -> partial+final
    // hash agg -> sort. Ref operators: TableScan/Filter/Select/GroupBy
    // (exec/GroupByOperator.java:78) expressed as one declarative plan.
    q("q01_tpch_q1",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(8,2)))
        |    AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(8,2))
        |    * CAST(1+l_tax AS DECIMAL(8,2))) AS DOUBLE) AS sum_charge,
        |  CAST((CAST(sum(CAST(l_quantity AS DECIMAL(25,2)))*10000 AS HUGEINT)*2 + count(*)) // (2*count(*)) AS DOUBLE)/10000.0 AS avg_qty,
        |  CAST((CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2)))*10000 AS HUGEINT)*2 + count(*)) // (2*count(*)) AS DOUBLE)/10000.0 AS avg_price,
        |  CAST((CAST(sum(CAST(l_discount AS DECIMAL(25,2)))*10000 AS HUGEINT)*2 + count(*)) // (2*count(*)) AS DOUBLE)/10000.0 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import Exact._
      t(spark, dir, "lineitem")
        .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsumExpr(dmul2($"l_extendedprice", lit(1) - $"l_discount")).as("sum_disc_price"),
          dsumExpr(dmul3($"l_extendedprice", lit(1) - $"l_discount", lit(1) + $"l_tax")).as("sum_charge"),
          davg($"l_quantity").as("avg_qty"),
          davg($"l_extendedprice").as("avg_price"),
          davg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // TPC-H Q6 shape: selective scan, filter fully pushed down, global agg.
    q("q02_filter_q6",
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          $"l_shipdate" < to_timestamp(lit("1997-01-01 00:00:00")) &&
          $"l_discount".between(0.03, 0.07) && $"l_quantity" < 24)
        .agg(Exact.dsumExpr(Exact.dmul2($"l_extendedprice", $"l_discount")).as("revenue"))
    },

    // --- joins -------------------------------------------------------------
    // TPC-H Q3 shape: 3-way join, small side broadcast, agg, top-N
    // (TakeOrderedAndProject replaces Hive's TopNKeyOperator).
    q("q03_join_q3_topn",
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(1-l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = t(spark, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      val o = t(spark, dir, "orders")
        .filter($"o_orderdate" < to_timestamp(lit("1998-03-15 00:00:00")))
      val l = t(spark, dir, "lineitem")
        .filter($"l_shipdate" > to_timestamp(lit("1996-03-15 00:00:00")))
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(Exact.dsumExpr(Exact.dmul2($"l_extendedprice", lit(1) - $"l_discount")).as("revenue"))
        .select($"l_orderkey", $"revenue",
          date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"), $"o_orderpriority")
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },

    // TPC-H Q5 shape: 5-way join with broadcast dims (MapJoinOperator analog,
    // ref exec/MapJoinOperator.java:86 -> BroadcastHashJoinExec).
    q("q04_join_q5_broadcast",
      """SELECT n_name, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(1-l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = t(spark, dir, "customer")
      val o = t(spark, dir, "orders")
        .filter($"o_orderdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          $"o_orderdate" < to_timestamp(lit("1998-01-01 00:00:00")))
      val l = t(spark, dir, "lineitem")
      val s = t(spark, dir, "supplier")
      val n = t(spark, dir, "nation")
      val r = t(spark, dir, "region").filter($"r_name" === "ASIA")
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .join(broadcast(s), $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(Exact.dsumExpr(Exact.dmul2($"l_extendedprice", lit(1) - $"l_discount")).as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    },

    q("q05_join_left_outer",
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(25,2))),0) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = t(spark, dir, "customer")
      val o = t(spark, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("n_orders"),
          coalesce(sum(o("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(25, 2))), lit(0))
            .cast("double").as("total_spent"))
        .orderBy(c("c_custkey"))
    },

    q("q06_join_right_outer",
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = t(spark, dir, "customer")
      val o = t(spark, dir, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"), "right_outer")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("n_orders"))
        .orderBy(c("c_custkey"))
    },

    q("q07_join_full_outer",
      """SELECT coalesce(s.nk, c.nk) AS nationkey,
        |  coalesce(n_supp, 0) AS n_supp, coalesce(n_cust, 0) AS n_cust
        |FROM (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |FULL JOIN (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
        |  ON s.nk = c.nk
        |ORDER BY nationkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val s = t(spark, dir, "supplier").groupBy($"s_nationkey".as("snk"))
        .agg(count(lit(1)).as("n_supp"))
      val c = t(spark, dir, "customer").groupBy($"c_nationkey".as("cnk"))
        .agg(count(lit(1)).as("n_cust"))
      s.join(c, $"snk" === $"cnk", "full_outer")
        .select(coalesce($"snk", $"cnk").as("nationkey"),
          coalesce($"n_supp", lit(0L)).as("n_supp"),
          coalesce($"n_cust", lit(0L)).as("n_cust"))
        .orderBy($"nationkey")
    },

    // LEFT SEMI (EXISTS) — ref JoinDesc.java:45-51 LEFT SEMI JOIN type.
    q("q08_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = t(spark, dir, "customer")
      val o = t(spark, dir, "orders").filter($"o_totalprice" > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    // LEFT ANTI (NOT EXISTS).
    q("q09_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = t(spark, dir, "customer")
      val o = t(spark, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    // Cartesian product (ref CrossProductHandler) — bounded dims only.
    q("q10_join_cross",
      """SELECT a.r_name AS r1, b.r_name AS r2 FROM region a CROSS JOIN region b
        |ORDER BY r1, r2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val a = t(spark, dir, "region").select($"r_name".as("r1"))
      val b = t(spark, dir, "region").select($"r_name".as("r2"))
      a.crossJoin(b).orderBy($"r1", $"r2")
    },

    // Equi key + non-equi residual predicate (theta join residual evaluation,
    // ref exec/CommonJoinOperator.java residual filters).
    q("q11_join_nonequi",
      """SELECT s_nationkey, count(*) AS n_pairs,
        |  CAST((CAST(sum(CAST(s_acctbal - c_acctbal AS DECIMAL(25,2)))*10000 AS HUGEINT)*2 + count(*)) // (2*count(*)) AS DOUBLE)/10000.0 AS avg_gap
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val s = t(spark, dir, "supplier")
      val c = t(spark, dir, "customer")
      s.join(c, $"s_nationkey" === $"c_nationkey" && $"s_acctbal" > $"c_acctbal")
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n_pairs"),
          Exact.davg($"s_acctbal" - $"c_acctbal").as("avg_gap"))
        .orderBy($"s_nationkey")
    },

    // Pure range-band join (no equi key) -> BroadcastNestedLoopJoin.
    q("q12_join_band",
      """SELECT band, count(*) AS n,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM part JOIN (VALUES (1, 0.0, 500.0), (2, 500.0, 1000.0),
        |  (3, 1000.0, 1500.0), (4, 1500.0, 1e9)) AS b(band, lo, hi)
        |ON p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    )(sqlQ(
      """SELECT band, count(*) AS n,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM part JOIN (VALUES (1, 0.0, 500.0), (2, 500.0, 1000.0),
        |  (3, 1000.0, 1500.0), (4, 1500.0, 1e9)) AS b(band, lo, hi)
        |ON p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY band ORDER BY band""".stripMargin)),

    // --- set operations ----------------------------------------------------
    q("q13_union_all",
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier) GROUP BY nk ORDER BY nk""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = t(spark, dir, "customer").select($"c_nationkey".as("nk"))
      val s = t(spark, dir, "supplier").select($"s_nationkey".as("nk"))
      c.union(s).groupBy($"nk").agg(count(lit(1)).as("n")).orderBy($"nk")
    },

    q("q14_union_distinct",
      """SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier
        |ORDER BY nk""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = t(spark, dir, "customer").select($"c_nationkey".as("nk"))
      val s = t(spark, dir, "supplier").select($"s_nationkey".as("nk"))
      c.union(s).distinct().orderBy($"nk")
    },

    // INTERSECT/EXCEPT [ALL] — Hive compiles these away via Calcite rewrites
    // (HiveIntersectRewriteRule.java); Spark has them native.
    q("q15_intersect",
      """SELECT c_nationkey AS nk FROM customer INTERSECT
        |SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = t(spark, dir, "customer").select($"c_nationkey".as("nk"))
      val s = t(spark, dir, "supplier").select($"s_nationkey".as("nk"))
      c.intersect(s).orderBy($"nk")
    },

    q("q16_intersect_all",
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer INTERSECT ALL
        |  SELECT s_nationkey FROM supplier) GROUP BY nk ORDER BY nk""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = t(spark, dir, "customer").select($"c_nationkey".as("nk"))
      val s = t(spark, dir, "supplier").select($"s_nationkey".as("nk"))
      c.intersectAll(s).groupBy($"nk").agg(count(lit(1)).as("n")).orderBy($"nk")
    },

    q("q17_except",
      """SELECT n_nationkey AS nk FROM nation EXCEPT
        |SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val n = t(spark, dir, "nation").select($"n_nationkey".as("nk"))
      val s = t(spark, dir, "supplier").select($"s_nationkey".as("nk"))
      n.except(s).orderBy($"nk")
    },

    q("q18_except_all",
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer EXCEPT ALL
        |  SELECT s_nationkey FROM supplier) GROUP BY nk ORDER BY nk""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = t(spark, dir, "customer").select($"c_nationkey".as("nk"))
      val s = t(spark, dir, "supplier").select($"s_nationkey".as("nk"))
      c.exceptAll(s).groupBy($"nk").agg(count(lit(1)).as("n")).orderBy($"nk")
    },

    // --- grouping sets / cube / rollup (GroupByOperator grouping-sets
    // expansion, ref exec/GroupByOperator.java:131,230-234) -----------------
    // GROUPING SETS via the pre-aggregated rollup operator: Spark's native
    // path Expands every row once per set (3× the stream into the aggregate);
    // graft.operators.Rollup aggregates once at the finest grain and rolls
    // each set up from the 6-row pre-aggregate — the plan that survives a
    // 100× scale-up. Native GROUPING SETS/CUBE/ROLLUP stay covered by
    // q20/q21; the oracle here is the standard SQL form.
    q("q19_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.operators.Rollup
      import org.apache.spark.sql.types.DecimalType
      Rollup.groupingSets(t(spark, dir, "lineitem"),
        keys = Seq("l_returnflag", "l_linestatus"),
        sets = Seq(Seq("l_returnflag", "l_linestatus"), Seq("l_returnflag"), Seq.empty),
        aggs = Seq(
          Rollup.Agg("sum_qty_d",
            graft.functions.MoneyDecimal($"l_quantity", 25, 2), Rollup.SumAgg),
          Rollup.Agg("n", lit(1), Rollup.CountAgg)))
        .select($"l_returnflag", $"l_linestatus",
          $"grouping_l_returnflag".as("g_rf"),
          $"grouping_l_linestatus".as("g_ls"),
          $"sum_qty_d".cast("double").as("sum_qty"), $"n")
        .orderBy($"g_rf", $"g_ls", $"l_returnflag".asc_nulls_first,
          $"l_linestatus".asc_nulls_first)
    },

    // nth_value with an explicit full frame + lead with a default — the
    // window-function tail (FunctionRegistry.java:653-690 surface).
    q("q51_nth_value",
      """SELECT c_custkey, c_nationkey,
        |  nth_value(c_custkey, 3) OVER (PARTITION BY c_nationkey ORDER BY c_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_ck,
        |  lead(c_custkey, 2, -1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS ld2
        |FROM customer ORDER BY c_custkey""".stripMargin
    )(sqlQ(
      """SELECT c_custkey, c_nationkey,
        |  nth_value(c_custkey, 3) OVER (PARTITION BY c_nationkey ORDER BY c_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_ck,
        |  lead(c_custkey, 2, -1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS ld2
        |FROM customer ORDER BY c_custkey""".stripMargin)),

    // GROUP BY ALL / ORDER BY ALL — the modern shorthand both engines share.
    q("q52_group_by_all",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin
    )(sqlQ(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin)),

    // LATERAL correlated subquery in FROM (the modern spelling of Hive's
    // LATERAL VIEW + correlated-derived-table patterns) — top-2 orders per
    // region through a two-hop correlation.
    q("q53_lateral_subquery",
      """SELECT r.r_name, t.o_orderkey, t.o_totalprice
        |FROM region r,
        |  LATERAL (
        |    SELECT o.o_orderkey, o.o_totalprice
        |    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |      JOIN nation n ON c.c_nationkey = n.n_nationkey
        |    WHERE n.n_regionkey = r.r_regionkey
        |    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) t
        |ORDER BY r.r_name, t.o_totalprice DESC, t.o_orderkey""".stripMargin
    )(sqlQ(
      """SELECT r.r_name, t.o_orderkey, t.o_totalprice
        |FROM region r,
        |  LATERAL (
        |    SELECT o.o_orderkey, o.o_totalprice
        |    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |      JOIN nation n ON c.c_nationkey = n.n_nationkey
        |    WHERE n.n_regionkey = r.r_regionkey
        |    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) t
        |ORDER BY r.r_name, t.o_totalprice DESC, t.o_orderkey""".stripMargin)),

    // Quantified comparison subqueries (ref ql/parse/SubQueryUtils.java;
    // subquery_ALL.q/subquery_ANY.q): Spark has no ANY/ALL predicate —
    // the engine front door lowers them to the Calcite
    // SubQueryRemoveRule aggregate form (plans/QuantifiedSubqueries).
    // DuckDB runs the identical quantified text natively, so the oracle
    // checks the lowering against an independent implementation.
    q("q54_quantified_subquery",
      """SELECT p_brand, count(*) AS c FROM part
        |WHERE p_size >= ALL (SELECT p_size FROM part WHERE p_brand = 'Brand#11')
        |  AND p_retailprice > ANY (SELECT p_retailprice FROM part WHERE p_brand = 'Brand#23')
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (spark, dir) =>
      Engine.sql(spark, dir,
        """SELECT p_brand, count(*) AS c FROM part
          |WHERE p_size >= ALL (SELECT p_size FROM part WHERE p_brand = 'Brand#11')
          |  AND p_retailprice > ANY (SELECT p_retailprice FROM part WHERE p_brand = 'Brand#23')
          |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
    },

    // Hive's default null placement sorts NULL as the LARGEST value
    // (HiveConf hive.default.nulls.last=true + ql/util/NullOrdering
    // .java): a bare ASC window ordering is NULLS LAST, observable
    // through first_value. The oracle spells the placement explicitly.
    q("q55_default_null_order",
      """SELECT k, v, first_value(v) OVER (PARTITION BY k ORDER BY v NULLS LAST) AS f
        |FROM (SELECT o_orderkey % 5 AS k, NULLIF(o_custkey % 7, 0) AS v FROM orders) t
        |ORDER BY k NULLS LAST, v NULLS LAST, f NULLS LAST""".stripMargin) { (spark, dir) =>
      Engine.sql(spark, dir,
        """SELECT k, v, first_value(v) OVER (PARTITION BY k ORDER BY v) AS f
          |FROM (SELECT o_orderkey % 5 AS k, NULLIF(o_custkey % 7, 0) AS v FROM orders) t
          |ORDER BY k, v, f""".stripMargin)
    },

    // DISTINCT window aggregates (ref windowing_distinct.q): Spark has
    // none — the front door lowers them to collect_set compositions
    // (plans/DistinctWindows). DuckDB oracle computes the same numbers
    // as grouped distinct aggregates joined back per row. Both legs
    // compute the distinct sum EXACTLY as DECIMAL, then emit DOUBLE:
    // r16/r17 proved the driver's representation-sensitive hash
    // diverges on decimal OUTPUT columns — the r16 red was
    // int128-backed DECIMAL(38,2); the r17 respell to int64-backed
    // DECIMAL(18,2) still hash-failed, and q56 was the ONLY query in
    // the 211-entry catalog with a decimal output column (every
    // hash-passing money query emits CAST(... AS DOUBLE)). The final
    // double is identical cross-engine: the unscaled sum stays far
    // under 2^53, so both engines' decimal→double conversions are the
    // same correctly-rounded value.
    q("q56_distinct_window",
      """SELECT o.o_custkey AS k, g.cp AS cp, g.sp AS sp
        |FROM orders o JOIN (
        |  SELECT o_custkey, count(DISTINCT o_orderpriority) AS cp,
        |         CAST(sum(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sp
        |  FROM orders GROUP BY o_custkey) g ON o.o_custkey = g.o_custkey
        |ORDER BY k, cp, sp""".stripMargin) { (spark, dir) =>
      Engine.sql(spark, dir,
        """SELECT o_custkey AS k,
          |  count(DISTINCT o_orderpriority) OVER (PARTITION BY o_custkey) AS cp,
          |  CAST(sum(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS DOUBLE) AS sp
          |FROM orders ORDER BY k, cp, sp""".stripMargin)
    },

    // UNIQUEJOIN verb (ref uniquejoin.q; plans/UniqueJoin): the
    // PRESERVE co-group over customer/orders is the left-outer shape —
    // customers with no orders survive with NULL order columns.
    q("q57_uniquejoin",
      """SELECT c.c_custkey AS k, o.o_orderkey AS ok
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |ORDER BY k, ok""".stripMargin) { (spark, dir) =>
      Engine.sql(spark, dir,
        "FROM UNIQUEJOIN PRESERVE customer c (c.c_custkey), orders o " +
          "(o.o_custkey) SELECT c.c_custkey AS k, o.o_orderkey AS ok " +
          "ORDER BY k, ok")
    },

    // Deterministic bucket TABLESAMPLE (ref sample2-9.q;
    // plans/BucketSample): BUCKET n OUT OF m ON col selects
    // hash(col) % m == n-1 with Hive's hash — identity for longs below
    // 2^31, which the oracle spells arithmetically.
    q("q58_bucket_sample",
      """SELECT count(*) AS c, CAST(sum(o_orderkey) AS BIGINT) AS s FROM orders
        |WHERE (o_orderkey & 2147483647) % 3 = 0""".stripMargin) {
      (spark, dir) =>
        Engine.sql(spark, dir,
          "SELECT count(*) AS c, sum(o_orderkey) AS s FROM orders " +
            "TABLESAMPLE (BUCKET 1 OUT OF 3 ON o_orderkey)")
    },

    q("q20_cube",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin
    )(sqlQ(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    q("q21_rollup",
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_p,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_s,
        |  count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY g_p, g_s, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin
    )(sqlQ(
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_p,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_s,
        |  count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY g_p, g_s, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)),

    // Multiple DISTINCT aggregates — Hive rewrites via CountDistinctRewriteProc;
    // Spark plans Expand + two-phase agg natively.
    q("q22_count_distinct",
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_suppkey").as("n_supp"),
          countDistinct($"l_partkey").as("n_part"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },

    // --- window functions (PTFOperator / WindowingTableFunction analogs) ---
    q("q23_window_rank",
      """SELECT * FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    rank() OVER w AS rk, dense_rank() OVER w AS drk, row_number() OVER w AS rn
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey))
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
      t(spark, dir, "customer")
        .select($"c_nationkey", $"c_custkey", $"c_acctbal",
          rank().over(w).as("rk"), dense_rank().over(w).as("drk"),
          row_number().over(w).as("rn"))
        .filter($"rn" <= 3)
        .orderBy($"c_nationkey", $"rn")
    },

    // ROWS frame running aggregate.
    q("q24_window_running",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
        |FROM lineitem WHERE l_suppkey < 5
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(spark, dir, "lineitem").filter($"l_suppkey" < 5)
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          round(sum($"l_extendedprice").over(w), 2).as("running_rev"))
        .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
    },

    // RANGE frame with a numeric boundary (ValueBoundaryScanner analog).
    q("q25_window_range",
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) OVER (PARTITION BY l_returnflag
        |    ORDER BY l_quantity RANGE BETWEEN 5.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_rev
        |FROM lineitem WHERE l_suppkey < 3
        |ORDER BY l_orderkey, l_linenumber, l_quantity, range_rev""".stripMargin
    )(sqlQ(
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) OVER (PARTITION BY l_returnflag
        |    ORDER BY l_quantity RANGE BETWEEN 5.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_rev
        |FROM lineitem WHERE l_suppkey < 3
        |ORDER BY l_orderkey, l_linenumber, l_quantity, range_rev""".stripMargin)),

    q("q26_window_leadlag",
      """SELECT event_id, user_id, value,
        |  lag(value, 1, 0.0) OVER w AS prev_value,
        |  lead(value, 1, -1.0) OVER w AS next_value
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(spark, dir, "events")
        .select($"event_id", $"user_id", $"value",
          lag($"value", 1, 0.0).over(w).as("prev_value"),
          lead($"value", 1, -1.0).over(w).as("next_value"))
        .orderBy($"event_id")
    },

    q("q27_window_ntile",
      """SELECT c_custkey, c_nationkey,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdist,
        |  first_value(c_custkey) OVER w AS first_ck,
        |  last_value(c_custkey) OVER w AS last_ck
        |FROM customer WHERE c_custkey < 200
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal", $"c_custkey")
      t(spark, dir, "customer").filter($"c_custkey" < 200)
        .select($"c_custkey", $"c_nationkey",
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"),
          first($"c_custkey").over(w).as("first_ck"),
          last($"c_custkey").over(w).as("last_ck"))
        .orderBy($"c_custkey")
    },

    // Time-interval RANGE frame (ValueBoundaryScanner over timestamps).
    q("q41_window_time_range",
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od,
        |  CAST(count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL '30 days' PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_30d
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_orderkey""".stripMargin
    ) { (spark, dir) =>
      Engine.register(spark, dir)
      spark.sql(
        """SELECT o_orderkey, date_format(o_orderdate, 'yyyy-MM-dd') AS od,
          |  count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
          |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS n_30d
          |FROM orders WHERE o_custkey < 50
          |ORDER BY o_orderkey""".stripMargin)
    },

    // IGNORE NULLS navigation functions over constructed nulls.
    q("q42_window_ignore_nulls",
      """SELECT event_id,
        |  last_value(big_v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_big
        |FROM (SELECT event_id, user_id, ts,
        |  CASE WHEN value > 90 THEN value END AS big_v FROM events)
        |ORDER BY event_id""".stripMargin
    ) { (spark, dir) =>
      Engine.register(spark, dir)
      spark.sql(
        """SELECT event_id,
          |  last_value(big_v) IGNORE NULLS OVER (PARTITION BY user_id
          |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |    AS last_big
          |FROM (SELECT event_id, user_id, ts,
          |  CASE WHEN value > 90 THEN value END AS big_v FROM events)
          |ORDER BY event_id""".stripMargin)
    },

    // Explicit NULLS FIRST/LAST ordering over constructed nulls.
    q("q43_null_ordering",
      """SELECT c_custkey, seg FROM (
        |  SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg FROM customer
        |  WHERE c_custkey < 40)
        |ORDER BY seg ASC NULLS LAST, c_custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "customer").filter($"c_custkey" < 40)
        .select($"c_custkey", nullif($"c_mktsegment", lit("BUILDING")).as("seg"))
        .orderBy($"seg".asc_nulls_last, $"c_custkey")
    },

    // json_tuple UDTF (multi-key JSON extraction in one pass).
    q("q44_json_tuple",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events WHERE event_id < 100 ORDER BY event_id""".stripMargin
    ) { (spark, dir) =>
      Engine.register(spark, dir)
      spark.sql(
        """SELECT event_id, CAST(t.k AS INT) AS k
          |FROM events LATERAL VIEW json_tuple(props, 'k') t AS k
          |WHERE event_id < 100 ORDER BY event_id""".stripMargin)
    },

    // NOT IN with a subquery -> null-aware anti join.
    q("q45_not_in_subquery",
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin
    )(sqlQ(
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin)),

    // --- subqueries (HiveSubQueryRemoveRule / HiveRelDecorrelator analogs,
    // all handled by Catalyst's RewriteCorrelatedScalarSubquery etc.) -------
    q("q28_subquery_scalar",
      """SELECT o_orderstatus, count(*) AS n, CAST((CAST(sum(CAST(o_totalprice AS DECIMAL(25,2)))*100 AS HUGEINT)*2 + count(*)) // (2*count(*)) AS DOUBLE)/100.0 AS avg_price
        |FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    )(sqlQ(
      """SELECT o_orderstatus, count(*) AS n, CAST((CAST(sum(CAST(o_totalprice AS DECIMAL(25,2)))*100 AS BIGINT)*2 + count(*)) DIV (2*count(*)) AS DOUBLE)/100.0 AS avg_price
        |FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    q("q29_subquery_in",
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey =
        |  (SELECT r_regionkey FROM region WHERE r_name = 'ASIA'))
        |ORDER BY s_suppkey""".stripMargin
    )(sqlQ(
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey =
        |  (SELECT r_regionkey FROM region WHERE r_name = 'ASIA'))
        |ORDER BY s_suppkey""".stripMargin)),

    q("q30_subquery_exists",
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin
    )(sqlQ(
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin)),

    q("q31_subquery_corr_scalar",
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer c WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin
    )(sqlQ(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer c WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin)),

    // CTE + scalar-subquery max (TPC-H Q15 shape).
    q("q32_cte_q15",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(8,2))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin
    )(sqlQ(
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(8,2))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin)),

    // VALUES inline table (ref: SemanticAnalyzer VALUES support).
    q("q33_values_inline",
      """SELECT v.code, r.r_name FROM (VALUES (0,'AF'), (1,'AM'), (2,'AS'),
        |  (3,'EU'), (4,'ME')) AS v(rk, code)
        |JOIN region r ON r.r_regionkey = v.rk ORDER BY v.code""".stripMargin
    )(sqlQ(
      """SELECT v.code, r.r_name FROM (VALUES (0,'AF'), (1,'AM'), (2,'AS'),
        |  (3,'EU'), (4,'ME')) AS v(rk, code)
        |JOIN region r ON r.r_regionkey = v.rk ORDER BY v.code""".stripMargin)),

    // Pivot (Hive expresses as conditional aggregation; Spark has native pivot).
    q("q34_pivot",
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(25,2)) END) AS DOUBLE) AS F,
        |  CAST(sum(CASE WHEN o_orderstatus='O' THEN CAST(o_totalprice AS DECIMAL(25,2)) END) AS DOUBLE) AS O,
        |  CAST(sum(CASE WHEN o_orderstatus='P' THEN CAST(o_totalprice AS DECIMAL(25,2)) END) AS DOUBLE) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum($"o_totalprice".cast(org.apache.spark.sql.types.DecimalType(25, 2))).cast("double"))
        .orderBy($"o_orderpriority")
    },

    // LIMIT + OFFSET (LimitOperator with offset, ref exec/LimitOperator.java:97).
    q("q35_limit_offset",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "orders")
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .offset(10).limit(20)
    },

    q("q36_select_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem")
        .select($"l_returnflag", $"l_linestatus").distinct()
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // Deterministic hash sample (TABLESAMPLE capability with a
    // cross-engine-reproducible hash; Spark's native .sample(seed) RNG is
    // engine-specific so md5 is the portable spec).
    q("q37_sample_hash",
      """SELECT count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total FROM orders
        |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)),1,1) = '0'""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "orders")
        .filter(substring(md5($"o_orderkey".cast("string").cast("binary")), 1, 1) === "0")
        .agg(count(lit(1)).as("n"), Exact.dsum($"o_totalprice").as("total"))
    },

    // Three-branch union with mixed ALL/DISTINCT composition.
    q("q46_union_multi",
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier
        |  UNION ALL SELECT n_nationkey FROM nation)
        |GROUP BY nk ORDER BY nk""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = t(spark, dir, "customer").select($"c_nationkey".as("nk"))
      val s = t(spark, dir, "supplier").select($"s_nationkey".as("nk"))
      val n = t(spark, dir, "nation").select($"n_nationkey".as("nk"))
      c.union(s).union(n).groupBy($"nk").agg(count(lit(1)).as("n")).orderBy($"nk")
    },

    // Derived table with a window, filtered outside (nested pipeline).
    q("q47_derived_window",
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2 AND o_custkey < 100 ORDER BY o_custkey, rn""".stripMargin
    )(sqlQ(
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2 AND o_custkey < 100 ORDER BY o_custkey, rn""".stripMargin)),

    // Conditional-aggregation matrix + HAVING over computed aggregates.
    q("q48_case_agg_matrix",
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_quantity < 10 THEN 1 ELSE 0 END) AS BIGINT) AS small_q,
        |  CAST(sum(CASE WHEN l_quantity BETWEEN 10 AND 40 THEN 1 ELSE 0 END) AS BIGINT) AS mid_q,
        |  CAST(sum(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS BIGINT) AS big_q,
        |  CAST(sum(CASE WHEN l_discount > 0.05
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS disc_rev
        |FROM lineitem GROUP BY l_returnflag
        |HAVING count(*) > 100 ORDER BY l_returnflag""".stripMargin
    )(sqlQ(
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_quantity < 10 THEN 1 ELSE 0 END) AS BIGINT) AS small_q,
        |  CAST(sum(CASE WHEN l_quantity BETWEEN 10 AND 40 THEN 1 ELSE 0 END) AS BIGINT) AS mid_q,
        |  CAST(sum(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS BIGINT) AS big_q,
        |  CAST(sum(CASE WHEN l_discount > 0.05
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS disc_rev
        |FROM lineitem GROUP BY l_returnflag
        |HAVING count(*) > 100 ORDER BY l_returnflag""".stripMargin)),

    // Self-join: pairs of same-customer orders placed within 30 days.
    q("q49_self_join",
      """SELECT a.o_custkey AS ck, count(*) AS n_pairs
        |FROM orders a JOIN orders b
        |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        |  AND abs(datediff('day', CAST(a.o_orderdate AS DATE),
        |    CAST(b.o_orderdate AS DATE))) <= 30
        |GROUP BY a.o_custkey ORDER BY n_pairs DESC, ck LIMIT 25""".stripMargin
    ) { (spark, dir) =>
      Engine.register(spark, dir)
      spark.sql(
        """SELECT a.o_custkey AS ck, count(*) AS n_pairs
          |FROM orders a JOIN orders b
          |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
          |  AND abs(datediff(a.o_orderdate, b.o_orderdate)) <= 30
          |GROUP BY a.o_custkey ORDER BY n_pairs DESC, ck LIMIT 25""".stripMargin)
    },

    // Ordered string aggregation (listagg / string_agg).
    q("q50_listagg",
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin
    )(sqlQ(
      """SELECT n_regionkey,
        |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),

    // --- UDTF / lateral view (UDTFOperator + LateralViewJoinOperator) ------
    q("q38_explode_wordcount",
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY n DESC, word LIMIT 25""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "documents")
        .select(explode(split($"text", " ")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"word").limit(25)
    },

    q("q39_posexplode",
      """SELECT doc_id, i-1 AS pos, words[i] AS word
        |FROM (SELECT doc_id, string_split(text,' ') AS words FROM documents
        |      WHERE doc_id < 10) t,
        |  LATERAL (SELECT unnest(generate_series(1, len(words))) AS i) u
        |ORDER BY doc_id, pos""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "documents").filter($"doc_id" < 10)
        .select($"doc_id", posexplode(split($"text", " ")))
        .select($"doc_id", $"pos", $"col".as("word"))
        .orderBy($"doc_id", $"pos")
    },

    // Hive LATERAL VIEW syntax works in Spark SQL directly.
    q("q40_lateral_view",
      """SELECT source, word, count(*) AS n
        |FROM (SELECT source, unnest(string_split(text,' ')) AS word FROM documents)
        |WHERE word LIKE 's%' GROUP BY source, word
        |ORDER BY source, n DESC, word LIMIT 50""".stripMargin
    )(sqlQ(
      """SELECT source, word, count(*) AS n
        |FROM documents LATERAL VIEW explode(split(text, ' ')) w AS word
        |WHERE word LIKE 's%' GROUP BY source, word
        |ORDER BY source, n DESC, word LIMIT 50""".stripMargin)),
  )
}
