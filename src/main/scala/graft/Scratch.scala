package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement harness (not part of the engine; deleted before
  * round close).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.configure(spark)

    val df = SparkEntry.queries("p38_tfidf_topterms")(spark, sfDir)
    df.collect()
    val plan0 = df.queryExecution.executedPlan
    val plan = plan0 match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val exchanges = plan.collect {
      case q: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => q.plan
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/p38_plan.txt"),
      plan.toString + "\n\n=== canonicalized exchanges ===\n" +
      exchanges.zipWithIndex.map { case (e, i) =>
        s"--- exchange $i ---\n" + e.canonicalized.toString
      }.mkString("\n"))
    println("[scratch] wrote /tmp/p38_plan.txt, exchanges=" + exchanges.size)
    spark.stop()
  }
}
