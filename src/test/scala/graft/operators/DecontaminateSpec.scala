package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "to be or not to be")).toDF("doc_id", "text")

  test("verbatim k-gram copies are flagged; clean docs are not") {
    val corpus = Seq(
      // 5 consecutive words lifted from bench doc 1 -> 1 shared 5-gram at
      // k=5, 2 shared 4-grams at k=4
      (10L, "intro text then the quick brown fox jumps and more"),
      (11L, "completely unrelated words about spark query planning"),
      // rearranged words, no contiguous k-gram survives
      (12L, "fox brown quick the dog lazy over jumps")).toDF("doc_id", "text")
    val stats = Decontaminate.overlapStats(corpus, bench, k = 4, minOverlap = 2)
      .select($"doc_id", $"n_overlap", $"contaminated")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(stats(10L) == ((2L, 1)))
    assert(stats(11L) == ((0L, 0)))
    assert(stats(12L) == ((0L, 0)))
  }

  test("benchmark docs shorter than k match whole-text copies") {
    val shortBench = Seq((1L, "rare answer")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "rare answer"), // exact copy of a 2-token benchmark item
      (11L, "rare answer plus more words here")).toDF("doc_id", "text")
    val stats = Decontaminate.overlapStats(corpus, shortBench, k = 5, minOverlap = 1)
      .select($"doc_id", $"contaminated")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the exact copy shares the whole-doc gram; the longer doc's 5-grams
    // never equal the 2-token benchmark gram
    assert(stats(10L) == 1)
    assert(stats(11L) == 0)
  }

  test("decontaminate drops flagged docs and keeps the rest intact") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog indeed"),
      (11L, "spark plans are declarative and catalyst optimizes them")
    ).toDF("doc_id", "text")
    val clean = Decontaminate.decontaminate(corpus, bench, k = 5, minOverlap = 2)
    assert(clean.columns.toSeq == Seq("doc_id", "text"))
    assert(clean.select("doc_id").as[Long].collect().toSeq == Seq(11L))
  }

  test("counts distinct shared grams, not occurrences") {
    // the same stolen 4-gram repeated twice still counts once
    val corpus = Seq(
      (10L, "the quick brown fox padding words the quick brown fox")
    ).toDF("doc_id", "text")
    val n = Decontaminate.overlapStats(corpus, bench, k = 4, minOverlap = 1)
      .select($"n_overlap").as[Long].head()
    assert(n == 1L)
  }

  test("benchmark side is broadcast (corpus never shuffles for matching)") {
    val corpus = Seq((10L, "a b c d e f g")).toDF("doc_id", "text")
    val plan = Decontaminate.overlapStats(corpus, bench)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast of the benchmark gram set:\n$plan")
  }
}
