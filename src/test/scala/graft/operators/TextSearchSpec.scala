package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark join"),       // tf(spark)=3, dl=4
    (2L, "spark join window filter"),     // tf(spark)=1, dl=4
    (3L, "join window filter scan"),      // no query term
    (4L, "spark"),                        // tf=1, dl=1 (short doc boost)
    (5L, "filter scan merge sort hash")).toDF("doc_id", "text")

  /** Scalar BM25 reference implementation (same formula as the operator). */
  private def bm25(tf: Double, df: Double, n: Double, dl: Double,
      avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
      tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

  test("scores match the closed-form BM25 formula") {
    val out = TextSearch.bm25TopK(docs, Seq("spark"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val avgdl = (4 + 4 + 4 + 1 + 5) / 5.0
    def expect(tf: Double, dl: Double) =
      BigDecimal(bm25(tf, df = 3, n = 5, dl, avgdl))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet == Set(1L, 2L, 4L))
    assert(math.abs(out(1L) - expect(3, 4)) < 1e-9)
    assert(math.abs(out(2L) - expect(1, 4)) < 1e-9)
    assert(math.abs(out(4L) - expect(1, 1)) < 1e-9)
  }

  test("rank ordering: higher tf and shorter docs score higher; k bounds output") {
    val out = TextSearch.bm25TopK(docs, Seq("spark"), k = 2)
      .select($"doc_id", $"rnk").collect().map(r => (r.getLong(0), r.getInt(1)))
    // doc 1 (tf=3) first; doc 4 (tf=1 but dl=1 normalization boost) beats doc 2
    assert(out.toSeq == Seq((1L, 1), (4L, 2)))
  }

  test("multi-term queries sum per-term contributions") {
    val one = TextSearch.bm25TopK(docs, Seq("spark"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val two = TextSearch.bm25TopK(docs, Seq("spark", "join"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // docs with both terms strictly gain; join-only docs appear
    assert(two(1L) > one(1L) && two(2L) > one(2L))
    assert(two.contains(3L) && !one.contains(3L))
  }

  test("termStats reports df and non-negative idf") {
    val st = TextSearch.termStats(docs, Seq("spark", "join", "nosuchterm"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(st("spark")._1 == 3L && st("join")._1 == 3L)
    assert(!st.contains("nosuchterm")) // zero-df terms don't appear
    assert(st.values.forall(_._2 >= 0.0))
  }

  test("tfidfTopTerms matches the closed form and ranks per doc") {
    // minLen=1 keeps the short fixture vocabulary; 5 docs
    val out = TextSearch.tfidfTopTerms(docs, k = 2, minLen = 1)
      .collect().map(r => (r.getLong(0), r.getInt(3)) ->
        (r.getString(1), r.getDouble(2))).toMap
    // doc 1: spark tf=3 df=3 -> 3*ln(5/3); join tf=1 df=3 -> ln(5/3)
    val lnFiveThirds = math.log(5.0 / 3.0)
    assert(out((1L, 1))._1 == "spark")
    assert(math.abs(out((1L, 1))._2 - 3 * lnFiveThirds) < 1e-4)
    assert(out((1L, 2)) == ("join",
      BigDecimal(lnFiveThirds).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble))
    // doc 5's rarest terms (merge/sort/hash, df=1) outrank common ones;
    // the tie among equal scores breaks alphabetically
    assert(out((5L, 1))._1 == "hash" && out((5L, 2))._1 == "merge")
    // every doc yields at most k rows, ranks contiguous from 1
    val perDoc = out.keys.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted)
    perDoc.foreach { case (_, rs) => assert(rs == (1 to rs.length)) }
  }

  test("plan shape: tfidf per-doc top-k plans a WindowGroupLimit") {
    val plan = TextSearch.tfidfTopTerms(docs, k = 2, minLen = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-doc top-k should prune before the rank shuffle:\n$plan")
  }

  test("plan shape: top-k is TakeOrderedAndProject, stats/df broadcast") {
    val plan = TextSearch.bm25TopK(docs, Seq("spark"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected distributed top-k:\n$plan")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast corpus stats:\n$plan")
  }
}
