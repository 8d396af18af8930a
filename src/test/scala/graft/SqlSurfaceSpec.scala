package graft

import org.apache.spark.sql.functions._

/** SQL-surface features asserted directly: TRANSFORM (ScriptOperator),
  * DISTRIBUTE/CLUSTER/SORT BY, EXPLAIN modes, xpath family, str_to_map,
  * sentences, misc scalar gaps — SURVEY §2.1/§2.5/§2.8 items that don't fit
  * the oracle harness.
  */
class SqlSurfaceSpec extends SparkSpec {

  private def sql1[T](q: String): T =
    spark.sql(s"SELECT $q AS v").head().getAs[T]("v")

  test("TRANSFORM pipes rows through an external script (ScriptOperator)") {
    Engine.register(spark, sfDir)
    val out = spark.sql(
      """SELECT TRANSFORM(r_regionkey, r_name) USING 'cat' AS (k STRING, name STRING)
        |FROM region""".stripMargin).collect()
    assert(out.length === 5)
    assert(out.map(_.getString(1)).toSet.contains("ASIA"))
  }

  test("TRANSFORM with ROW FORMAT DELIMITED custom field separators") {
    Engine.register(spark, sfDir)
    // ',' separators survive both directions through cat (ref ScriptOperator +
    // LazySimpleSerDe delimiter handling). Note Spark splits script output
    // with a regex, so regex metacharacters ('|') are not usable verbatim.
    val out = spark.sql(
      """SELECT TRANSFORM(r_regionkey, r_name)
        |  ROW FORMAT DELIMITED FIELDS TERMINATED BY ','
        |  USING 'cat'
        |  AS (k STRING, name STRING)
        |  ROW FORMAT DELIMITED FIELDS TERMINATED BY ','
        |FROM region""".stripMargin).collect()
    assert(out.length === 5)
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet
      .contains(("2", "ASIA")))
  }

  test("FROM src INSERT ... INSERT ... multi-insert SQL (SemanticAnalyzer multi-insert)") {
    Engine.register(spark, sfDir)
    val d = java.nio.file.Files.createTempDirectory("graft_mi_").toString
    spark.sql(s"CREATE TABLE mi_hi (r_regionkey BIGINT, r_name STRING) USING parquet LOCATION '$d/hi'")
    spark.sql(s"CREATE TABLE mi_lo (r_regionkey BIGINT, r_name STRING) USING parquet LOCATION '$d/lo'")
    try {
      spark.sql(
        """FROM region
          |INSERT INTO mi_hi SELECT r_regionkey, r_name WHERE r_regionkey >= 3
          |INSERT INTO mi_lo SELECT r_regionkey, r_name WHERE r_regionkey < 3""".stripMargin)
      assert(spark.table("mi_hi").count() === 2)
      assert(spark.table("mi_lo").count() === 3)
    } finally {
      spark.sql("DROP TABLE IF EXISTS mi_hi")
      spark.sql("DROP TABLE IF EXISTS mi_lo")
    }
  }

  test("DISTRIBUTE BY / SORT BY / CLUSTER BY shape the partitioning") {
    Engine.register(spark, sfDir)
    val distributed = spark.sql(
      "SELECT c_custkey, c_nationkey FROM customer DISTRIBUTE BY c_nationkey SORT BY c_custkey")
    val plan = distributed.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning(c_nationkey"))
    assert(plan.contains("Sort [c_custkey") && plan.contains("], false, 0"))
    val clustered = spark.sql(
      "SELECT c_custkey, c_nationkey FROM customer CLUSTER BY c_nationkey")
    assert(clustered.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning(c_nationkey"))
    assert(distributed.count() === 150)
  }

  test("EXPLAIN modes render") {
    Engine.register(spark, sfDir)
    Seq("EXPLAIN", "EXPLAIN EXTENDED", "EXPLAIN FORMATTED", "EXPLAIN COST").foreach { m =>
      val txt = spark.sql(s"$m SELECT count(*) FROM lineitem WHERE l_quantity > 10")
        .head().getString(0)
      assert(txt.contains("Physical Plan") || txt.contains("=="))
    }
  }

  test("xpath family") {
    assert(sql1[String]("xpath_string('<a><b>bb</b><c>cc</c></a>', 'a/c')") === "cc")
    assert(sql1[Int]("xpath_int('<a>12</a>', 'a')") === 12)
    assert(sql1[Seq[String]]("xpath('<a><b>b1</b><b>b2</b></a>', 'a/b/text()')") ===
      Seq("b1", "b2"))
    assert(sql1[Boolean]("xpath_boolean('<a><b>1</b></a>', 'a/b')"))
  }

  test("str_to_map / substring_index / elt / conv / sentences / bround") {
    val m = sql1[Map[String, String]]("str_to_map('a:1,b:2', ',', ':')")
    assert(m === Map("a" -> "1", "b" -> "2"))
    assert(sql1[String]("substring_index('a.b.c', '.', 2)") === "a.b")
    assert(sql1[String]("elt(2, 'x', 'y', 'z')") === "y")
    assert(sql1[String]("conv('255', 10, 16)") === "FF")
    val sents = spark.sql(
      "SELECT sentences('Hello there. How are you') AS s").head().getSeq[Seq[String]](0)
    assert(sents === Seq(Seq("Hello", "there"), Seq("How", "are", "you")))
    assert(sql1[Double]("CAST(bround(2.5, 0) AS DOUBLE)") === 2.0) // banker's rounding
    assert(sql1[Double]("CAST(round(2.5, 0) AS DOUBLE)") === 3.0)  // HALF_UP
  }

  test("stack and inline UDTFs") {
    val st = spark.sql("SELECT stack(2, 'a', 1, 'b', 2) AS (k, v)").collect()
    assert(st.map(r => (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("a", 1), ("b", 2)))
    val inl = spark.sql(
      "SELECT inline(array(named_struct('x', 1, 'y', 'p'), named_struct('x', 2, 'y', 'q')))")
      .collect()
    assert(inl.map(_.getInt(0)).toSeq === Seq(1, 2))
  }

  test("reflect/java_method refuse by policy; assert_true/raise_error surface") {
    // reflect/java_method resolve but REFUSE: arbitrary JVM reflection from
    // SQL is excluded by policy (an explicit override of Spark's live
    // builtin — see HiveFunctions), not silently absent
    val e = intercept[Exception] {
      spark.sql("SELECT reflect('java.lang.String', 'valueOf', 42)").collect()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("disabled"))
    assert(sql1[String]("typeof(1.5)") === "decimal(2,1)")
    // assert_true returns null on success
    assert(spark.sql("SELECT assert_true(1 < 2) AS v").head().isNullAt(0))
  }

  test("Hive-style implicit coercions and division semantics (non-ANSI)") {
    Engine.configure(spark)
    // string <-> numeric coercion
    assert(sql1[Double]("'5' + 1") === 6.0)
    assert(sql1[Double]("'3.5' * 2") === 7.0)
    assert(sql1[Boolean]("'10' > 9"))
    // `/` is always fractional; `div` is integral (Hive semantics)
    assert(sql1[Double]("5 / 2") === 2.5)
    assert(sql1[Long]("5 div 2") === 2L)
    // bad string casts yield NULL; numeric overflow wraps (both Hive-style,
    // never a runtime error)
    assert(spark.sql("SELECT CAST('abc' AS INT) AS v").head().isNullAt(0))
    assert(sql1[Int]("CAST(99999999999 AS INT)") === 1215752191) // 2^32 wrap
  }

  test("virtual columns: INPUT__FILE__NAME and GROUPING__ID resolve " +
      "through the SQL front door (ref ql/metadata/VirtualColumn.java)") {
    Engine.register(spark, sfDir)
    // provenance: every region row names the parquet file it came from
    val files = Engine.sql(spark, sfDir,
      "SELECT DISTINCT INPUT__FILE__NAME AS f FROM region")
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("region")))
    // and it composes inside expressions and CTEs
    val viaCte = Engine.sql(spark, sfDir,
      """WITH src AS (SELECT r_name, INPUT__FILE__NAME AS f FROM region)
        |SELECT count(DISTINCT f) AS n FROM src""".stripMargin)
      .head().getLong(0)
    assert(viaCte >= 1L)
    // GROUPING__ID: the standard bit vector over a rollup (HIVE-16102
    // semantics == Spark's grouping_id)
    val gids = Engine.sql(spark, sfDir,
      """SELECT l_returnflag, l_linestatus, GROUPING__ID AS gid, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus WITH ROLLUP
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin).collect()
    assert(gids.map(_.getLong(2)).toSet === Set(0L, 1L, 3L))
    val viaFn = Engine.sql(spark, sfDir,
      """SELECT l_returnflag, l_linestatus, grouping_id() AS gid, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus WITH ROLLUP
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin).collect()
    assert(gids.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSeq ===
      viaFn.map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq)
    // the offsets family stays unresolved with Spark's canonical error
    intercept[Exception] {
      Engine.sql(spark, sfDir,
        "SELECT BLOCK__OFFSET__INSIDE__FILE FROM region").collect()
    }
  }

  test("grouping filter via HAVING and positional/alias GROUP BY") {
    Engine.register(spark, sfDir)
    val r = spark.sql(
      """SELECT l_returnflag AS rf, count(*) AS n FROM lineitem
        |GROUP BY 1 HAVING count(*) > 100 ORDER BY rf""".stripMargin).collect()
    assert(r.nonEmpty)
    val byAlias = spark.sql(
      """SELECT l_returnflag AS rf, count(*) AS n FROM lineitem
        |GROUP BY rf ORDER BY rf""".stripMargin).collect()
    assert(byAlias.map(_.getString(0)).toSeq === r.map(_.getString(0)).toSeq.sorted.distinct
      .filter(f => byAlias.map(_.getString(0)).contains(f)))
  }
}
