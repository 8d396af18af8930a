package graft.plans

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

class MaterializedViewsSpec extends SparkSpec {

  private def mvPath(name: String): String =
    java.nio.file.Files.createTempDirectory("graft_mv_").toString + "/" + name

  test("exact-subtree queries are rewritten to read the MV") {
    import spark.implicits._
    Engine.configure(spark)
    val li = Engine.table(spark, sfDir, "lineitem")
    def aggDf = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("sq"), count(lit(1)).as("n"))
    val path = mvPath("agg_mv")
    MaterializedViews.create(spark, "agg_mv", aggDf, path)
    try {
      val q = aggDf.orderBy($"l_returnflag") // MV subtree + extra sort on top
      val optimized = q.queryExecution.optimizedPlan
      // the aggregate is gone, replaced by a relation scan of the MV files
      assert(!optimized.toString.contains("Aggregate"),
        s"expected MV scan in plan:\n$optimized")
      val scannedPaths = optimized.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.mkString(",")
      }
      assert(scannedPaths.exists(_.contains(new java.io.File(path).getName)))
      // results identical to computing from scratch
      val expected = li.groupBy($"l_returnflag")
        .agg(sum($"l_quantity").as("sq"), count(lit(1)).as("n"))
        .orderBy($"l_returnflag").collect()
      assert(q.collect().toSeq === expected.toSeq)
    } finally MaterializedViews.drop(spark, "agg_mv")
  }

  test("non-matching queries are untouched and MV drop restores planning") {
    import spark.implicits._
    Engine.configure(spark)
    val li = Engine.table(spark, sfDir, "lineitem")
    val path = mvPath("other_mv")
    MaterializedViews.create(spark, "other_mv",
      li.groupBy($"l_linestatus").agg(avg($"l_tax").as("at")), path)
    try {
      val different = li.groupBy($"l_returnflag").agg(max($"l_quantity"))
      assert(different.queryExecution.optimizedPlan.toString.contains("Aggregate"))
    } finally MaterializedViews.drop(spark, "other_mv")
    val again = li.groupBy($"l_linestatus").agg(avg($"l_tax").as("at"))
    assert(again.queryExecution.optimizedPlan.toString.contains("Aggregate"))
  }

  test("rollup containment: coarser group-by is answered from the MV") {
    import spark.implicits._
    Engine.configure(spark)
    val li = Engine.table(spark, sfDir, "lineitem")
    val path = mvPath("rollup_mv")
    // MV at (returnflag, linestatus) grain
    MaterializedViews.create(spark, "rollup_mv",
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity").as("sq"), count(lit(1)).as("n"),
          min($"l_discount").as("mind"), max($"l_discount").as("maxd")),
      path)
    try {
      // query at coarser (returnflag) grain with sum/count/min/max
      def q = li.groupBy($"l_returnflag")
        .agg(sum($"l_quantity").as("sq"), count(lit(1)).as("n"),
          min($"l_discount").as("mind"), max($"l_discount").as("maxd"))
      val plan = q.queryExecution.optimizedPlan
      val scans = plan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.mkString(",")
      }
      assert(scans.exists(_.contains(new java.io.File(path).getName)),
        s"expected rollup over MV scan in plan:\n$plan")
      // results identical to computing from the base table (MV rule off)
      val fresh = li.groupBy($"l_returnflag")
        .agg(sum($"l_quantity").as("sq2"), count(lit(1)).as("n2"),
          min($"l_discount").as("mind2"), max($"l_discount").as("maxd2"))
        .orderBy($"l_returnflag").collect()
      val got = q.orderBy($"l_returnflag").collect()
      assert(got.map(_.toSeq).toSeq === fresh.map(_.toSeq).toSeq)
    } finally MaterializedViews.drop(spark, "rollup_mv")
  }

  test("rollup with residual filter on an MV grouping key") {
    import spark.implicits._
    Engine.configure(spark)
    val li = Engine.table(spark, sfDir, "lineitem")
    val path = mvPath("filter_mv")
    MaterializedViews.create(spark, "filter_mv",
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity").as("sq")),
      path)
    try {
      def q = li.filter($"l_linestatus" === "F").groupBy($"l_returnflag")
        .agg(sum($"l_quantity").as("sq"))
      val plan = q.queryExecution.optimizedPlan
      val scans = plan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.mkString(",")
      }
      assert(scans.exists(_.contains(new java.io.File(path).getName)),
        s"expected filtered rollup over MV scan in plan:\n$plan")
      val fresh = li.filter($"l_linestatus" === "F").groupBy($"l_returnflag")
        .agg(sum($"l_quantity").as("sq")).orderBy($"l_returnflag").collect()
      assert(q.orderBy($"l_returnflag").collect().map(_.toSeq).toSeq ===
        fresh.map(_.toSeq).toSeq)
    } finally MaterializedViews.drop(spark, "filter_mv")
  }

  test("filter on a non-grouping column blocks the rollup rewrite") {
    import spark.implicits._
    Engine.configure(spark)
    val li = Engine.table(spark, sfDir, "lineitem")
    val path = mvPath("block_mv")
    MaterializedViews.create(spark, "block_mv",
      li.groupBy($"l_returnflag").agg(sum($"l_quantity").as("sq")), path)
    try {
      // filter on l_discount (not a grouping key) — must NOT use the MV
      val q = li.filter($"l_discount" > 0.05).groupBy($"l_returnflag")
        .agg(sum($"l_quantity").as("sq"))
      val scans = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.mkString(",")
      }
      assert(!scans.exists(_.contains(new java.io.File(path).getName)))
    } finally MaterializedViews.drop(spark, "block_mv")
  }

  test("avg rolls up from MV sum+count (double-typed)") {
    import spark.implicits._
    Engine.configure(spark)
    val li = Engine.table(spark, sfDir, "lineitem")
    // collect the reference BEFORE registering the MV — afterwards the same
    // aggregate would itself be rewritten and the check would be vacuous
    val want = li.groupBy($"l_returnflag").agg(avg($"l_discount").as("x"))
      .orderBy($"l_returnflag").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val path = mvPath("avg_mv")
    MaterializedViews.create(spark, "avg_mv",
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_discount").as("sd"), count($"l_discount").as("cd")),
      path)
    try {
      def q = li.groupBy($"l_returnflag").agg(avg($"l_discount").as("ad"))
      val scans = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.mkString(",")
      }
      assert(scans.exists(_.contains(new java.io.File(path).getName)),
        s"expected avg rollup over MV in:\n${q.queryExecution.optimizedPlan}")
      // numerically equal to the direct computation (same sums re-associated;
      // tolerance covers double re-association)
      val got = q.orderBy($"l_returnflag").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got.keySet === want.keySet)
      got.foreach { case (k, v) =>
        assert(math.abs(v - want(k)) <= 1e-9 * math.max(1.0, math.abs(want(k))))
      }
    } finally MaterializedViews.drop(spark, "avg_mv")
  }

  test("a FILTER-clause aggregate blocks the rollup rewrite") {
    import spark.implicits._
    Engine.configure(spark)
    val li = Engine.table(spark, sfDir, "lineitem")
    val path = mvPath("filteragg_mv")
    MaterializedViews.create(spark, "filteragg_mv",
      li.groupBy($"l_returnflag", $"l_linestatus").agg(sum($"l_quantity").as("sq")),
      path)
    try {
      li.createOrReplaceTempView("li_mv_fagg")
      // FILTER (WHERE ...) must NOT be answered from the unfiltered MV sums
      val q = spark.sql(
        """SELECT l_returnflag,
          |  sum(l_quantity) FILTER (WHERE l_discount > 0.05) AS sq
          |FROM li_mv_fagg GROUP BY l_returnflag""".stripMargin)
      val scans = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.mkString(",")
      }
      assert(!scans.exists(_.contains(new java.io.File(path).getName)))
      // and the filtered result is correct
      val want = li.filter($"l_discount" > 0.05).groupBy($"l_returnflag")
        .agg(sum($"l_quantity")).orderBy($"l_returnflag").collect().map(_.toSeq).toSeq
      assert(q.orderBy($"l_returnflag").collect().map(_.toSeq).toSeq === want)
    } finally MaterializedViews.drop(spark, "filteragg_mv")
  }

  test("DML through the engine invalidates MVs over the written path") {
    import spark.implicits._
    Engine.configure(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_dml_").toString
    val tablePath = dir + "/t"
    spark.range(10).selectExpr("id AS k", "id * 2 AS v")
      .write.parquet(tablePath)
    val base = spark.read.parquet(tablePath)
    val path = mvPath("stale_mv")
    MaterializedViews.create(spark, "stale_mv",
      base.agg(sum($"v").as("sv")), path)
    assert(MaterializedViews.registered(spark).exists(_.name == "stale_mv"))
    // copy-on-write DELETE through the engine drops the MV
    Dml.deleteWhere(spark, tablePath, col("k") >= 5)
    assert(!MaterializedViews.registered(spark).exists(_.name == "stale_mv"))
    // fresh query sees post-DML data, not the stale MV
    val sv = spark.read.parquet(tablePath).agg(sum($"v")).as[Long].head()
    assert(sv === (0L until 5).map(_ * 2).sum)
  }
}
