package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword relevance search over a document corpus: BM25 scoring and top-k
  * retrieval, plus the per-term corpus statistics (tf/df/idf) it derives.
  *
  * The reference exposes full-text predicates only through external handlers;
  * here ranking is expressed relationally so Catalyst owns the physical plan
  * end-to-end (ref ql provenance: the n-gram/token stream mirrors
  * GenericUDFSentences.java tokenization, pinned to this engine's `tokens`
  * spec).
  *
  * Scale design: term frequencies come from one explode→groupBy keyed by
  * (doc, term) — the shuffle carries only query-term hits because the `isin`
  * filter runs BEFORE the exchange, map-side. Document-frequency and corpus
  * stats are term-count-sized and broadcast back. The final top-k is
  * TakeOrderedAndProject (k rows per partition cross the wire, never the
  * scored corpus).
  */
object TextSearch {

  /** BM25 scores for every document matching at least one query term:
    * `(idCol, bm25, rnk)`, the global top `k` by score (ties broken by id).
    *
    * score(d) = Σ_t ln(1 + (N - df + 0.5)/(df + 0.5))
    *              · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * with N = corpus size, dl = document token length, avgdl its corpus
    * mean — the standard Okapi BM25 with the Lucene-style non-negative idf.
    * Scores are rounded to 4 decimals (cross-engine float stability).
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
      idCol: String = "doc_id", textCol: String = "text",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__ws"))
      .select(col(idCol), col("__ws"),
        size(col("__ws")).cast("double").as("__dl"))
    // Corpus stats: one tiny aggregate row, broadcast into the score join.
    val stats = toks.agg(count(lit(1)).cast("double").as("__n_docs"),
      avg(col("__dl")).as("__avgdl"))
    // Query-term hits only cross the wire: the isin filter is map-side.
    val tf = toks
      .select(col(idCol), col("__dl"), explode(col("__ws")).as("__term"))
      .filter(col("__term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    // sum(1.0 + __tf·0.0) == count(*) here (__tf finite, non-null) but
    // keeps the __tf column consumed so this branch shares tf's exchange
    // instead of re-running the tokenize→explode pass — same reuse fix as
    // tfidfTopTerms below (r17), same exactness argument.
    val dft = tf.groupBy(col("__term"))
      .agg(sum(lit(1.0) + col("__tf") * lit(0.0)).as("__df"))
    val scored = tf
      .join(broadcast(dft), "__term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n_docs") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__s",
        col("__idf") * col("__tf") * (k1 + 1.0) /
          (col("__tf") + (col("__dl") / col("__avgdl") * b + (1.0 - b)) * k1))
    val agg = scored.groupBy(col(idCol))
      .agg(round(sum(col("__s")), 4).as("bm25"))
    // orderBy+limit plans as TakeOrderedAndProject (single sorted partition
    // of k rows); the rank is then just the row's position in that
    // partition — monotonically_increasing_id starts at 0 on partition 0 —
    // so no global WindowExec (and no "No Partition Defined" log flood) is
    // ever planned.
    agg.orderBy(col("bm25").desc, col(idCol)).limit(k)
      .withColumn("rnk", (monotonically_increasing_id() + 1).cast("int"))
  }

  /** Top-`k` characteristic terms per document by TF-IDF:
    * `(idCol, term, tfidf, rnk)` with tfidf = tf · ln(N/df), ranked per doc
    * (score desc, term asc). `minLen` drops short function words map-side
    * before anything shuffles.
    *
    * Scale: one explode→groupBy(doc,term) for tf (map-side partial agg), a
    * groupBy(term) for df whose result is vocabulary-sized (re-joined on the
    * term key — at 100 TB the df side is still ≪ corpus and hash-joins on
    * term), and the per-doc top-k plans as WindowGroupLimit, so only k rows
    * per doc survive each partition before the rank shuffle.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int, minLen: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__ws"))
    val n = toks.agg(count(lit(1)).cast("double").as("__n_docs"))
    val tf = toks
      .select(col(idCol), explode(col("__ws")).as("term"))
      .filter(length(col("term")) >= minLen)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    // df counts tf's ROWS — spelled sum(1.0 + __tf·0.0), which is exactly
    // count(*) as a double (__tf is a count: finite, non-null) but CONSUMES
    // the __tf column in a way no rewrite can elide (x·0.0 is not foldable:
    // a NaN/Inf x must answer NaN, and count-of-non-nullable collapses to
    // count(1), which is how the plain spellings lost the column). With
    // count(*) Catalyst pruned __tf and collapsed this branch's copy of
    // the (doc,term) aggregate to a bare distinct — a subtree that no
    // longer canonicalizes with tf's, so AQE ran the whole
    // tokenize→explode→aggregate pipeline TWICE (r17 finding: two
    // ShuffleQueryStages over identical scans in the executed plan).
    // Consuming __tf keeps both branches on ONE exchange: the corpus is
    // tokenized once and dft rolls up from the reused shuffle stage.
    val dft = tf.groupBy(col("term"))
      .agg(sum(lit(1.0) + col("__tf") * lit(0.0)).as("__df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__score").desc, col("term"))
    tf.join(dft, "term")
      .crossJoin(broadcast(n))
      .withColumn("__score", col("__tf") * log(col("__n_docs") / col("__df")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), round(col("__score"), 4).as("tfidf"),
        col("rnk").cast("int").as("rnk"))
  }

  /** Per-term corpus statistics for the supplied vocabulary:
    * `(term, df, idf)` — df = documents containing the term, idf as in
    * [[bm25TopK]]. Useful for vocabulary pruning / stopword induction.
    */
  def termStats(docs: DataFrame, terms: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val toks = docs.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__ws"))
    val n = toks.agg(count(lit(1)).cast("double").as("__n_docs"))
    toks.select(col(idCol), explode(array_distinct(col("__ws"))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .withColumn("idf",
        round(log(lit(1.0) + (col("__n_docs") - col("df") + 0.5) / (col("df") + 0.5)), 4))
      .drop("__n_docs")
  }
}
