package graft

/** Re-measures the front-door cost note (Engine.scala): analyze-only
  * loop over three simple statements, engine front door vs plain
  * spark.sql. Prints per-statement milliseconds; not an assertion —
  * the number feeds the cost note.
  */
class FrontDoorCostSpec extends SparkSpec {
  test("front-door per-statement overhead (informational)") {
    val stmts = Seq(
      "SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem GROUP BY l_returnflag",
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey < 100",
      "SELECT n_name FROM nation JOIN region ON n_regionkey = r_regionkey")
    Engine.register(spark, sfDir)
    def time(f: String => Unit): Double = {
      stmts.foreach(f) // warm
      val n = 40
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => stmts.foreach(f))
      (System.nanoTime() - t0) / 1e6 / (n * stmts.size)
    }
    val spark0 = time(s => spark.sql(s).queryExecution.analyzed)
    val engine = time(s => Engine.sql(spark, sfDir, s).queryExecution.analyzed)
    println(f"[front-door] spark.sql analyze: $spark0%.2f ms/stmt; " +
      f"engine front door: $engine%.2f ms/stmt; overhead: ${engine - spark0}%.2f ms")
  }
}
