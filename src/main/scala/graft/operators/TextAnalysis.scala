package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus processing: tokenization
  * stats, quality scoring, language ID, document fingerprinting.
  *
  * All operators are pure narrow projections built from codegen'd Catalyst
  * expressions (no UDFs, no shuffles) — at 100 TB they run map-side at scan
  * speed and scale linearly with partition count. Extends the reference's text
  * surface (sentences/ngrams, ref ql/.../udf/generic/GenericUDFSentences.java,
  * GenericUDAFnGrams.java) with the corpus-hygiene operators an LLM data
  * pipeline needs.
  */
object TextAnalysis {

  /** Whitespace tokenizer (Hive sentences()-style splitting, simplified to a
    * pinned spec: split on runs of whitespace, no empty tokens — leading/
    * trailing whitespace and empty text yield no artifacts).
    */
  def tokens(text: Column): Column =
    array_remove(split(trim(text), "\\s+"), "")

  /** Token count per document. */
  def withTokenCount(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_tokens", size(tokens(col(textCol))))

  /** BPE-ish subword count estimate: words + extra tokens for long words
    * (every 4 chars beyond the first 4 ≈ one more subword).
    */
  def withSubwordEstimate(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_subwords",
      aggregate(tokens(col(textCol)), lit(0L),
        (acc, w) => acc + lit(1L) + (greatest(length(w) - 4, lit(0)) / 4).cast("long")))

  /** Quality metrics: length, token stats, stopword/punctuation/digit ratios,
    * type-token ratio. Mirrors the heuristics used to filter web corpora.
    */
  def withQualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val ws = tokens(text)
    val stop = array(Seq("the", "a", "of", "and", "to", "in", "is", "it",
      "for", "on", "with", "as", "at", "by", "an").map(lit): _*)
    df.withColumn("n_chars_m", length(text).cast("long"))
      .withColumn("n_tokens", size(ws).cast("long"))
      .withColumn("avg_token_len",
        round(length(text).cast("double") / greatest(size(ws), lit(1)), 4))
      .withColumn("stopword_ratio",
        round(size(array_intersect(array_distinct(ws), stop)).cast("double") /
          greatest(size(array_distinct(ws)), lit(1)), 4))
      .withColumn("digit_ratio",
        round((length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("double") /
          greatest(length(text), lit(1)), 4))
      .withColumn("punct_ratio",
        round((length(text) - length(regexp_replace(text, "[^\\w\\s]", ""))).cast("double") /
          greatest(length(text), lit(1)), 4))
      .withColumn("type_token_ratio",
        round(size(array_distinct(ws)).cast("double") / greatest(size(ws), lit(1)), 4))
  }

  private val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "es" -> Seq("el", "la", "de", "y", "es", "en", "un", "que", "no", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "que", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "这", "中", "大"))

  /** Heuristic language ID: stopword-hit score per language, highest wins
    * (ties broken lexically). Pure expression — no shuffle, no UDF.
    */
  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val ws = array_distinct(tokens(col(textCol)))
    val scored = langStopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(array_intersect(ws, array(words.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    // greatest picks max score; on ties the later (lexically larger) struct
    // wins in struct comparison only if score equal and lang greater — invert
    // lang ordering is unnecessary for a heuristic; document tie rule as-is.
    df.withColumn("lang_scores", array(scored: _*))
      .withColumn("lang_pred", element_at(array_sort(col("lang_scores"),
        (a, b) => when(a("score") > b("score"), -1)
          .when(a("score") < b("score"), 1)
          .when(a("lang") < b("lang"), -1).when(a("lang") > b("lang"), 1)
          .otherwise(0)), 1)("lang"))
      .withColumn("lang_score", element_at(array_sort(col("lang_scores"),
        (a, b) => when(a("score") > b("score"), -1)
          .when(a("score") < b("score"), 1)
          .when(a("lang") < b("lang"), -1).when(a("lang") > b("lang"), 1)
          .otherwise(0)), 1)("score"))
      .drop("lang_scores")
  }

  /** Word k-shingles as strings ("w1 w2 ... wk"). */
  def shingles(words: Column, k: Int): Column =
    when(size(words) >= k,
      transform(sequence(lit(0), size(words) - k),
        i => concat_ws(" ", slice(words, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", words)))

  /** Rolling document fingerprint: min/max/count of shingle hashes plus a
    * combined fingerprint. Content-defined, order-independent of
    * partitioning, computable map-side at scan speed. The shingle hash is
    * the PORTABLE 60-bit MD5 slice (`conv(substring(md5(s),1,15),16,10)`)
    * rather than xxhash64, so any ANSI engine with md5() replays the exact
    * values — fingerprints are cross-engine identities you can compare
    * against an independent system, and the p09 catalog query holds them
    * under a DuckDB oracle.
    */
  def withFingerprint(df: DataFrame, textCol: String = "text", k: Int = 5): DataFrame = {
    val hs = graft.functions.TextHashColumns.portableShingleHashes(tokens(col(textCol)), k)
    df.withColumn("fp_min", array_min(hs))
      .withColumn("fp_max", array_max(hs))
      .withColumn("fp_xor", aggregate(hs, lit(0L), (acc, h) => acc.bitwiseXOR(h)))
      .withColumn("n_shingles", size(hs).cast("long"))
  }

  /** Word-bigram list of a document ("w1 w2", "w2 w3", ...). */
  def bigrams(text: Column): Column = {
    val ws = tokens(text)
    zip_with(slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
      slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Repetition metrics (Gopher-rules-style corpus hygiene): duplicate-word
    * count and the most-frequent-bigram share per document. Computed
    * relationally (explode → count → max per doc) so the per-document cost is
    * O(bigrams), not O(bigrams²) interpreted lambdas — the shuffle is keyed
    * by doc id and carries one row per distinct bigram.
    */
  def repetitionMetrics(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val base = df.select(col(idCol),
      size(tokens(text)).cast("long").as("n_words"),
      size(array_distinct(tokens(text))).cast("long").as("n_distinct_words"),
      bigrams(text).as("_bg"))
    val perBigram = base
      .select(col(idCol), explode(col("_bg")).as("_b"))
      .groupBy(col(idCol), col("_b"))
      .agg(count(lit(1)).as("_cnt"))
    val perDoc = perBigram
      .groupBy(col(idCol))
      .agg(sum(col("_cnt")).as("n_bigrams"), max(col("_cnt")).as("top_bigram_cnt"))
    // explode drops docs with no bigrams (< 2 tokens, empty, null text) —
    // exactly the degenerate docs hygiene rules must still see: left-join the
    // metrics back so every input doc appears, with zeroed bigram stats
    base.select(col(idCol), col("n_words"), col("n_distinct_words"))
      .join(perDoc, Seq(idCol), "left_outer")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("top_bigram_cnt", coalesce(col("top_bigram_cnt"), lit(0L)))
      .withColumn("dup_word_cnt", col("n_words") - col("n_distinct_words"))
      .withColumn("top_bigram_ratio",
        round(col("top_bigram_cnt").cast("double") /
          greatest(col("n_bigrams"), lit(1L)), 4))
  }

  /** Word-unigram entropy per document (bits): H = log2(n) − Σc·log2(c)/n
    * over word frequencies — the compression-ratio proxy quality filters use
    * (low entropy = repetitive/templated text, high = diverse vocabulary).
    * Relational like [[repetitionMetrics]]: explode → per-word counts → one
    * aggregate per doc; the shuffle is keyed by doc id and carries one row
    * per distinct word. Empty documents get 0.0.
    */
  def wordEntropy(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val perWord = df
      .select(col(idCol), explode(tokens(col(textCol))).as("__w"))
      .groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).cast("double").as("__c"))
    val perDoc = perWord.groupBy(col(idCol))
      .agg(sum(col("__c")).as("__n"),
        sum(col("__c") * log2(col("__c"))).as("__s"))
      .select(col(idCol),
        round(log2(col("__n")) - col("__s") / col("__n"), 4).as("word_entropy"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left_outer")
      .withColumn("word_entropy", coalesce(col("word_entropy"), lit(0.0)))
  }

  /** PII scrubbing: emails, phone numbers, and IPv4 literals replaced with
    * typed placeholders. Patterns are RE2-safe (portable) and the operator is
    * a pure codegen'd projection — scan-speed at any scale. Extends the
    * reference's masking surface (GenericUDFMask*) to free-text columns.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\d{3}[-.]\\d{3}[-.]\\d{4}" -> "<PHONE>",
    "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}" -> "<IP>")

  /** Same value as `PiiPatterns.foldLeft(regexp_replace)` — the one-pass
    * expression keeps the sequential three-pattern semantics and removes the
    * per-stage String↔UTF8String materialization (see
    * [[graft.functions.PiiScrub]]; equality pinned by PiiScrubSpec).
    */
  def scrubPii(text: Column): Column = graft.functions.PiiScrub(text)

  def withScrubbedText(df: DataFrame, textCol: String = "text",
      outCol: String = "text_scrubbed"): DataFrame =
    df.withColumn(outCol, scrubPii(col(textCol)))

  /** Corpus-trained bigram language-model scoring — the perplexity-style
    * quality filter of the CCNet pipeline family (Wenzek et al. 2020),
    * expressed fully relationally: bigram counts are one (w1, w2)-keyed
    * aggregation, context counts fold from them, add-k smoothing
    * P(w2|w1) = (c12 + k) / (c1 + k·V) is a projection, and each document's
    * score joins its bigrams back to the model. Returns
    * (id, n_bigrams, bigram_nll) where bigram_nll = −mean ln P (4 dp;
    * NULL for documents with fewer than 2 tokens). Everything is keyed —
    * no cartesian, no UDF, no driver-side model; at 100 TB persist the
    * (w1, w2, p) model table once and reuse it across scoring runs instead
    * of letting both consumers recompute the tokenization.
    */
  def bigramNll(df: DataFrame, idCol: String, textCol: String = "text",
      k: Double = 0.5): DataFrame = {
    // bigrams are "w1 w2" strings (tokens are whitespace-free, so the
    // space join is unambiguous); the context word is the first token
    val docBg = df.select(col(idCol), explode(bigrams(col(textCol))).as("bg"))
    val cbg = docBg.groupBy(col("bg"))
      .agg(count(lit(1)).cast("double").as("c12"))
    val withCtx = cbg.withColumn("w1", substring_index(col("bg"), " ", 1))
    val c1 = withCtx.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = df.select(explode(tokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).cast("double").as("vocab"))
    val probs = withCtx.join(c1, "w1").crossJoin(broadcast(vocab))
      .select(col("bg"),
        ((col("c12") + k) / (col("c1") + lit(k) * col("vocab"))).as("p"))
    val scored = docBg.join(probs, "bg")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(-avg(log(col("p"))), 4).as("bigram_nll"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("bigram_nll"))
  }

  /** Fixed-size overlapping character windows over each document — the
    * context-window chunking a training/RAG pipeline runs before
    * tokenization. 1 row → ceil((len−size)/step)+1 rows (one empty chunk
    * for empty text), entirely relational: `sequence` + `explode` + a
    * positional `substr`, so it's a codegen'd UDTF-shape plan with no UDF
    * and no shuffle. Chunk boundaries are character-indexed and therefore
    * identical under any partitioning (deterministic for retry/replay).
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String = "text",
      size: Int = 200, overlap: Int = 50): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    val text = coalesce(col(textCol), lit(""))
    // last chunk index: 0 when the doc fits in one window, else
    // ceil((len - size) / step) — the final window may extend past the end
    // (substr truncates), matching the standard sliding-window contract
    val lastIdx = when(length(text) <= size, lit(0L))
      .otherwise(ceil((length(text) - size).cast("double") / step).cast("long"))
    df.select(col(idCol), text.as("__text"),
        explode(sequence(lit(0L), lastIdx)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        col("__text").substr(
          (col("chunk_idx") * step + 1).cast("int"), lit(size)).as("chunk"))
  }

  /** Exact-substring duplicate spans (the ExactSubstr dedup of Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499 — suffix-array formulation replaced by a relational
    * k-gram one): every maximal run of word positions whose k-word gram
    * occurs MORE THAN ONCE in the corpus, as
    * `(idCol, start_word, end_word, n_grams)` (1-based inclusive word
    * positions). A span is text shared verbatim with another document (or
    * repeated within one) for at least `k` consecutive words — the unit the
    * paper cuts from training data.
    *
    * Scale: one row per word position flows into ONE gram-keyed aggregation
    * with map-side partial counts (O(corpus words) — the same asymptotics
    * as the paper's suffix array), duplicated grams join back position-wise
    * (dup-gram side is aggregated and usually small), and the
    * islands-and-gaps merge is a per-doc window. Nothing is all-pairs.
    */
  def repeatedSpans(df: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    val pos = df
      .select(col(idCol), tokens(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= k)
      .select(col(idCol),
        explode(sequence(lit(1), size(col("__ws")) - (k - 1))).as("pos"),
        col("__ws"))
      .select(col(idCol), col("pos"),
        md5(array_join(slice(col("__ws"), col("pos"), lit(k)), " ")
          .cast("binary")).as("__h"))
    val dup = pos.groupBy(col("__h"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select(col("__h"))
    val hits = pos.join(dup, "__h").select(col(idCol), col("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    hits
      .withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("pos")).as("start_word"),
        (max(col("pos")) + (k - 1)).as("end_word"),
        count(lit(1)).as("n_grams"))
      .drop("__grp")
  }

  /** Cut every [[repeatedSpans]] span out of the text (ExactSubstr's removal
    * step — all occurrences drop, arXiv:2107.06499 §4.1): returns one row
    * per input document with `text_deduped` (surviving words joined by a
    * single space) and `n_words_kept`. Documents shorter than `k` words or
    * with no duplicated span pass through whitespace-normalized; a fully
    * duplicated document survives as an empty string (the downstream length
    * filter's job, not silent row loss).
    *
    * Scale: spans explode into their covered positions (O(duplicated
    * words)), survivors are a position-keyed anti-join (all equi), and the
    * rebuild is one per-doc aggregation of (pos, word) structs.
    */
  def dropRepeatedSpans(df: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spans = repeatedSpans(df, k, idCol, textCol)
    val words = df
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("__p0", "__w")))
      .select(col(idCol), (col("__p0") + 1).as("__pos"), col("__w"))
    val covered = spans.select(col(idCol),
      explode(sequence(col("start_word"), col("end_word"))).as("__pos"))
    val rebuilt = words.join(covered, Seq(idCol, "__pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__w")))),
            x => x("__w")), " ").as("text_deduped"),
        count(lit(1)).as("n_words_kept"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("text_deduped"), lit("")).as("text_deduped"),
        coalesce(col("n_words_kept"), lit(0L)).as("n_words_kept"))
  }
}
