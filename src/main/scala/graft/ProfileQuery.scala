package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round profiling tool (guide §1, like PlanDump — a tool, not a
  * query path): splits each named bench query's wall time into
  * frame CONSTRUCTION (QDef.fn — front-door rewrites, table reads, operator
  * driver jobs), PLANNING (analysis + optimization + physical planning of the
  * built frame) and EXECUTION (noop sink, which re-plans the write), per rep,
  * in the exact session the bench uses. Reps beyond the first run hot, so the
  * numbers separate fixed per-query overhead from the data term.
  *
  * Usage: sbt "runMain graft.ProfileQuery q02_filter_q6 t13_customer_distribution"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.configure(spark)
    val names = if (args.nonEmpty) args.toSeq else Seq("q02_filter_q6")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (0 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        val tag = if (i == 0) "warm" else s"rep$i"
        println(f"[profile] $name $tag build=${(t1 - t0) / 1e6}%.1fms " +
          f"plan=${(t2 - t1) / 1e6}%.1fms exec=${(t3 - t2) / 1e6}%.1fms " +
          f"total=${(t3 - t0) / 1e6}%.1fms")
      }
    }
    spark.stop()
  }
}
