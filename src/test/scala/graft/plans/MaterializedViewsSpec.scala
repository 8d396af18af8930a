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
    } finally MaterializedViews.drop("agg_mv")
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
    } finally MaterializedViews.drop("other_mv")
    val again = li.groupBy($"l_linestatus").agg(avg($"l_tax").as("at"))
    assert(again.queryExecution.optimizedPlan.toString.contains("Aggregate"))
  }
}
