package graft

/** Diagnostic: dump formatted physical plans for plan-quality review. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = "/root/testdata/sf0.01"
    args.headOption.map(Seq(_)).getOrElse(
      Seq("q01_tpch_q1", "q02_filter_q6", "q03_join_q3_topn",
        "q04_join_q5_broadcast", "p10_cosine_topk", "q24_window_running",
        "p13_minhash_pairs", "e01_tumbling_window")).foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString.take(4500))
    }
  }
}
