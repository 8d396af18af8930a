package graft.plans

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Hive's CTE materialization (threshold-gated temp-table rewrite, ref
  * ql/parse/SemanticAnalyzer.java:1560,2256) on the Engine.sql front
  * door: a WITH definition referenced >= threshold times evaluates ONCE.
  */
class CteMaterializeSpec extends SparkSpec {

  private val Key = CteMaterialize.ThresholdKey

  /** Staged-CTE parquet scans in an optimized plan (the materialized
    * form is a filesystem relation now, not a LogicalRDD).
    */
  private def stagedScans(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect {
      case r @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
          if fs.location.rootPaths.exists(_.toString.contains("graft_cte_"))
        => r
    }

  /** Rows flowing through the definition body, via an accumulator UDF —
    * inline evaluation pays the body per reference, materialization once.
    */
  private def measure(query: String): (Long, Array[String]) = {
    val acc = spark.sparkContext.longAccumulator("graft_cte_ticks")
    spark.udf.register("graft_tick", (x: Long) => { acc.add(1L); x })
    val rows = Engine.sql(spark, sfDir, query).collect()
      .map(_.toSeq.mkString(",")).sorted
    (acc.value, rows)
  }

  private val twoRefs =
    """WITH c AS (SELECT graft_tick(o_orderkey) AS k FROM orders)
      |SELECT * FROM (SELECT count(*) AS n, sum(k) AS s FROM c)
      |UNION ALL
      |SELECT * FROM (SELECT count(*) AS n, max(k) AS s FROM c)""".stripMargin

  test("flag off (default): every reference re-evaluates the definition " +
      "(Spark's canonical inlining)") {
    spark.conf.unset(Key)
    val n = Engine.sql(spark, sfDir, "SELECT count(*) FROM orders")
      .head().getLong(0)
    val (ticks, rows) = measure(twoRefs)
    assert(ticks === 2 * n, "two references = two evaluations inline")
    assert(rows.length === 2)
  }

  test("flag on: a definition referenced >= threshold evaluates once; " +
      "results identical to the inline plan") {
    spark.conf.unset(Key)
    val (inlineTicks, inlineRows) = measure(twoRefs)
    spark.conf.set(Key, "2")
    try {
      val (matTicks, matRows) = measure(twoRefs)
      assert(matRows === inlineRows, "materialization must not change results")
      assert(matTicks * 2 === inlineTicks,
        s"one evaluation expected, got $matTicks vs inline $inlineTicks")
    } finally spark.conf.unset(Key)
  }

  test("below-threshold definitions stay inline (no checkpoint in the plan)") {
    spark.conf.set(Key, "3")
    try {
      val df = Engine.sql(spark, sfDir,
        """WITH c AS (SELECT o_orderkey AS k FROM orders)
          |SELECT count(*) AS n FROM (SELECT * FROM c UNION ALL SELECT * FROM c)"""
          .stripMargin)
      assert(df.queryExecution.optimizedPlan.collect {
        case r: LogicalRDD => r }.isEmpty && stagedScans(df).isEmpty,
        "2 refs < threshold 3: no mat")
      assert(df.head().getLong(0) ===
        2 * Engine.sql(spark, sfDir, "SELECT count(*) FROM orders")
          .head().getLong(0))
    } finally spark.conf.unset(Key)
  }

  test("dependency chains and self-joins: later defs see the materialized " +
      "frame; repeated instances deduplicate") {
    spark.conf.set(Key, "2")
    try {
      // c referenced by d TWICE and by the main body once (3 refs, mat);
      // d referenced twice (mat, built ON the materialized c)
      val df = Engine.sql(spark, sfDir,
        """WITH c AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders
          |           WHERE o_orderkey % 3 = 0),
          |     d AS (SELECT a.k FROM c a JOIN c b ON a.k = b.k)
          |SELECT (SELECT count(*) FROM d) AS nd,
          |       (SELECT count(*) FROM d WHERE k % 2 = 0) AS nd2,
          |       count(*) AS nc
          |FROM c""".stripMargin)
      val r = df.head()
      val expect = Engine.sql(spark, sfDir,
        "SELECT count(*) FROM orders WHERE o_orderkey % 3 = 0")
        .head().getLong(0)
      assert(r.getLong(2) === expect)
      assert(r.getLong(0) === expect) // keys unique -> self-join = same count
      assert(stagedScans(df).nonEmpty, "materialized scans present")
    } finally spark.conf.unset(Key)
  }

  test("forward references compose: CteForwardRefs reorders, then " +
      "materialization applies in dependency order") {
    spark.conf.set(Key, "2")
    try {
      val df = Engine.sql(spark, sfDir,
        """WITH top AS (SELECT k FROM base WHERE k % 2 = 0),
          |     base AS (SELECT o_orderkey AS k FROM orders)
          |SELECT (SELECT count(*) FROM top) AS a, count(*) AS b FROM top"""
          .stripMargin)
      val r = df.head()
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getLong(0) > 0)
    } finally spark.conf.unset(Key)
  }

  test("materialized frames survive an executor-blocks drop: staged on " +
      "the filesystem, not pinned as RDD blocks; release() cleans up") {
    spark.conf.set(Key, "2")
    try {
      val df = Engine.sql(spark, sfDir,
        """WITH c AS (SELECT o_orderkey AS k FROM orders)
          |SELECT * FROM (SELECT count(*) AS n FROM c)
          |UNION ALL
          |SELECT * FROM (SELECT count(*) AS n FROM c WHERE k >= 0)"""
          .stripMargin)
      val scans = stagedScans(df)
      assert(scans.nonEmpty, "expected a staged parquet scan")
      // the localCheckpoint failure mode this guards against: dropping
      // every cached/executor block must not lose the materialization
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val rows = df.collect()
      assert(rows.length === 2)
      assert(rows.map(_.getLong(0)).distinct.toSeq ===
        Seq(Engine.sql(spark, sfDir, "SELECT count(*) FROM orders")
          .head().getLong(0)))
      // release() drops the staged dirs
      val dirs = scans.flatMap {
        case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.map(p => new java.io.File(p.toUri.getPath))
        case _ => Nil
      }
      assert(dirs.forall(_.exists()))
      CteMaterialize.release(spark)
      assert(dirs.forall(!_.exists()), "release() must delete staged dirs")
    } finally spark.conf.unset(Key)
  }

  test("a NullType-bearing definition falls back to the checkpoint path " +
      "and stays correct (parquet can't store void)") {
    spark.conf.set(Key, "2")
    try {
      val r = Engine.sql(spark, sfDir,
        """WITH c AS (SELECT o_orderkey AS k, NULL AS z FROM orders)
          |SELECT count(*) FROM (SELECT k FROM c UNION ALL SELECT k FROM c)"""
          .stripMargin).head().getLong(0)
      assert(r === 2 * Engine.sql(spark, sfDir,
        "SELECT count(*) FROM orders").head().getLong(0))
    } finally spark.conf.unset(Key)
  }

  test("an INTERVAL-bearing definition falls back to the checkpoint path " +
      "(Spark 4.1 refuses intervals with UNSUPPORTED_DATA_TYPE_FOR_" +
      "DATASOURCE, wording \"doesn't support\" — the fallback matches the " +
      "error condition, not message text)") {
    spark.conf.set(Key, "2")
    try {
      val r = Engine.sql(spark, sfDir,
        """WITH c AS (SELECT o_orderkey AS k, INTERVAL '1' DAY AS iv
          |           FROM orders)
          |SELECT count(*) FROM (SELECT k FROM c UNION ALL SELECT k FROM c)"""
          .stripMargin).head().getLong(0)
      assert(r === 2 * Engine.sql(spark, sfDir,
        "SELECT count(*) FROM orders").head().getLong(0))
    } finally spark.conf.unset(Key)
  }

  test("column aliases materialize with their definition; nested WITH " +
      "bails out conservatively — both stay correct") {
    spark.conf.set(Key, "1")
    try {
      // WITH t(a) AS ... — aliases parse inside the def and materialize
      val r1 = Engine.sql(spark, sfDir,
        """WITH t(a) AS (SELECT o_orderkey FROM orders)
          |SELECT count(*) FROM (SELECT a FROM t UNION ALL SELECT a FROM t)"""
          .stripMargin).head().getLong(0)
      // nested WITH: untouched (Spark's spelling), still correct
      val r2 = Engine.sql(spark, sfDir,
        """WITH u AS (WITH v AS (SELECT o_orderkey AS k FROM orders)
          |           SELECT k FROM v)
          |SELECT count(*) FROM (SELECT k FROM u UNION ALL SELECT k FROM u)"""
          .stripMargin).head().getLong(0)
      val n = Engine.sql(spark, sfDir, "SELECT count(*) FROM orders")
        .head().getLong(0)
      assert(r1 === 2 * n)
      assert(r2 === 2 * n)
    } finally spark.conf.unset(Key)
  }
}
