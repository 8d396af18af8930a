package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag (and drop) corpus documents that share
  * word k-grams with an evaluation/benchmark set — the standard guard against
  * test-set leakage when assembling LLM training corpora (13-gram overlap in
  * the published recipes; `k` is a parameter here).
  *
  * Extends the reference's text surface (ref
  * ql/src/java/org/apache/hadoop/hive/ql/udf/generic/GenericUDAFnGrams.java
  * computes n-gram frequencies; decontamination is the set-intersection use
  * of the same shingle stream) with the corpus-hygiene operator the reference
  * never needed.
  *
  * Grams are matched by their 64-bit xxhash (the same codegen'd primitive-
  * loop kernel MinHash/fingerprinting use, ~5× the throughput of building
  * gram strings through higher-order array lambdas, and 8-byte rows on the
  * wire instead of strings). Hash equality stands in for gram equality: a
  * false match needs an xxhash64 collision — P ≈ n²/2⁶⁵, ~10⁻⁸ even for a
  * 10⁹-gram corpus crossed with a 10⁶-gram benchmark — and decontamination
  * tolerates it gracefully (one spuriously-quarantined document).
  *
  * Scale design (100 TB corpus, small benchmark): the benchmark gram set is
  * an eval suite — thousands of documents, not billions — so it is
  * `broadcast()` and the corpus side never shuffles for candidate matching;
  * the only exchange is the per-document overlap count, keyed by doc id and
  * carrying ONLY matched grams (a row per contaminated-gram hit, not per
  * corpus gram). Gram hashing itself is map-side, at scan speed.
  */
object Decontaminate {

  /** Distinct word k-gram hashes per document (one exploded row each).
    * Documents shorter than `k` tokens contribute their whole text as one
    * gram, so short benchmark items (quiz answers, single sentences) still
    * match verbatim copies; empty/whitespace-only documents contribute
    * nothing.
    */
  private[graft] def grams(df: DataFrame, idCol: String, textCol: String,
      k: Int) =
    df.select(col(idCol),
      explode(array_distinct(graft.functions.TextHashColumns.shingleHashes(
        TextAnalysis.tokens(col(textCol)), k))).as("__gram"))

  /** Per-corpus-document overlap stats against the benchmark: every corpus
    * row comes back with `n_overlap` (distinct shared k-grams) and a 0/1
    * `contaminated` flag (`n_overlap >= minOverlap`).
    */
  def overlapStats(corpus: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 5, minOverlap: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    val benchGrams = broadcast(
      grams(benchmark, idCol, textCol, k).select(col("__gram")).distinct())
    val hits = grams(corpus, idCol, textCol, k)
      .join(benchGrams, "__gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
    corpus.join(hits, Seq(idCol), "left_outer")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("contaminated",
        (col("n_overlap") >= minOverlap).cast("int"))
  }

  /** The decontaminated corpus: input rows minus documents sharing
    * `minOverlap`+ distinct k-grams with the benchmark.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 5, minOverlap: Int = 2): DataFrame =
    overlapStats(corpus, benchmark, idCol, textCol, k, minOverlap)
      .filter(col("contaminated") === 0)
      .drop("n_overlap", "contaminated")
}
