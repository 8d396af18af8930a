package graft.operators

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("token count and subword estimate on known text") {
    import spark.implicits._
    val df = Seq(("the quick brownfoxed jumps", 1L)).toDF("text", "id")
    val tc = TextAnalysis.withTokenCount(df).head().getAs[Int]("n_tokens")
    assert(tc === 4)
    // subwords: the=1, quick=1+0 (5-4=1 -> 1/4 floor 0), brownfoxed=1+1 (10-4=6 -> 1), jumps=1
    val sw = TextAnalysis.withSubwordEstimate(df).head().getAs[Long]("n_subwords")
    assert(sw === 5L)
  }

  test("quality metrics on known text") {
    import spark.implicits._
    val df = Seq(("the cat 123 cat!", 1L)).toDF("text", "id")
    val r = TextAnalysis.withQualityScore(df).head()
    assert(r.getAs[Long]("n_chars_m") === 16L)
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Double]("digit_ratio") === 0.1875) // 3/16
    assert(r.getAs[Double]("punct_ratio") === 0.0625) // '!' only: 1/16
    // distinct tokens: the, cat, 123, cat! -> 4; stopwords: the -> 1/4
    assert(r.getAs[Double]("stopword_ratio") === 0.25)
  }

  test("shingles produce k-grams, short docs collapse to one shingle") {
    import spark.implicits._
    val df = Seq(Tuple1("a b c d"), Tuple1("a b")).toDF("text")
    val sh = df.select(TextAnalysis.shingles(split($"text", " "), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0) === Seq("a b c", "b c d"))
    assert(sh(1) === Seq("a b"))
  }

  test("langId predicts per-language stopword hits deterministically") {
    import spark.implicits._
    val df = Seq(
      ("the cat is on the mat and it runs", 1L),
      ("el gato es de la casa y no es un perro", 2L),
      ("der hund ist nicht ein gato und das haus", 3L)).toDF("text", "id")
    val out = TextAnalysis.withLangId(df).orderBy($"id")
      .select($"lang_pred").collect().map(_.getString(0))
    assert(out === Array("en", "es", "de"))
  }

  test("portable shingle hash equals conv(substring(md5(s),1,15),16,10)") {
    import spark.implicits._
    // the kernel's 60-bit MD5 slice must match the builtin expression any
    // ANSI engine can replay — this equality is what makes p09 oracle-able
    val docs = Engine.table(spark, sfDir, "documents").limit(20)
    val kernel = TextAnalysis.withFingerprint(docs, k = 5)
      .select($"doc_id", $"fp_min", $"fp_max", $"fp_xor", $"n_shingles")
    val hs = transform(
      TextAnalysis.shingles(TextAnalysis.tokens($"text"), 5),
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))
    val builtin = docs.select($"doc_id",
      array_min(hs).as("fp_min"), array_max(hs).as("fp_max"),
      aggregate(hs, lit(0L), (a, h) => a.bitwiseXOR(h)).as("fp_xor"),
      size(hs).cast("long").as("n_shingles"))
    assert(kernel.except(builtin).count() === 0)
    assert(builtin.except(kernel).count() === 0)
  }

  test("fingerprint is stable and content-derived") {
    import spark.implicits._
    val docs = Engine.table(spark, sfDir, "documents").limit(50)
    val fp1 = TextAnalysis.withFingerprint(docs).select($"doc_id", $"fp_min", $"fp_xor")
    val fp2 = TextAnalysis.withFingerprint(docs).select($"doc_id", $"fp_min", $"fp_xor")
    assert(fp1.except(fp2).count() === 0)
    // different docs (random synthetic) overwhelmingly differ
    val distinct = fp1.select($"fp_min").distinct().count()
    assert(distinct > 45)
  }

  test("repetition metrics on known text") {
    import spark.implicits._
    // "a b a b c": 5 words, 3 distinct, bigrams [a b, b a, a b, b c] -> top 2/4
    val df = Seq((1L, "a b a b c"), (2L, "x y z w")).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(df).orderBy($"doc_id").collect()
    assert(m(0).getAs[Long]("n_words") === 5L)
    assert(m(0).getAs[Long]("n_distinct_words") === 3L)
    assert(m(0).getAs[Long]("dup_word_cnt") === 2L)
    assert(m(0).getAs[Long]("n_bigrams") === 4L)
    assert(m(0).getAs[Long]("top_bigram_cnt") === 2L)
    assert(m(0).getAs[Double]("top_bigram_ratio") === 0.5)
    assert(m(1).getAs[Long]("top_bigram_cnt") === 1L)
  }

  test("word entropy: closed-form values, degenerate docs, every row kept") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a"),        // one symbol -> 0 bits
      (2L, "a b c d"),        // uniform over 4 -> 2 bits
      (3L, "a a b b"),        // uniform over 2 -> 1 bit
      (4L, "a a a b"),        // 3/4,1/4 -> ~0.8113
      (5L, "   ")).toDF("doc_id", "text") // no tokens -> 0.0, row kept
    val got = TextAnalysis.wordEntropy(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 0.0)
    assert(got(2L) === 2.0)
    assert(got(3L) === 1.0)
    assert(got(4L) === 0.8113)
    assert(got(5L) === 0.0)
    assert(got.size === 5)
  }

  test("PII scrubbing replaces emails, phones, and IPs with placeholders") {
    import spark.implicits._
    val df = Seq(
      "mail bob.smith+x@corp.example.org now",
      "call 555-123-4567 or 555.987.6543",
      "host 192.168.0.1 responded",
      "clean text stays untouched").toDF("text")
    val got = TextAnalysis.withScrubbedText(df).select($"text_scrubbed")
      .as[String].collect()
    assert(got(0) === "mail <EMAIL> now")
    assert(got(1) === "call <PHONE> or <PHONE>")
    assert(got(2) === "host <IP> responded")
    assert(got(3) === "clean text stays untouched")
  }

  test("bigramNll matches the closed-form add-k model on a tiny corpus") {
    import spark.implicits._
    // corpus: "a b a b" + "a b" + "x" -> cbg: (a,b)=3, (b,a)=1; c1: a=3, b=1
    // V=3 (a, b, x); k=0.5: P(b|a)=(3+.5)/(3+1.5)=7/9, P(a|b)=(1+.5)/(1+1.5)=0.6
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x")).toDF("id", "text")
    val got = TextAnalysis.bigramNll(df, "id").orderBy($"id").collect()
    val pBA = 3.5 / 4.5
    val pAB = 1.5 / 2.5
    val nll1 = BigDecimal(-(math.log(pBA) + math.log(pAB) + math.log(pBA)) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nll2 = BigDecimal(-math.log(pBA))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0).getLong(1) === 3 && got(0).getDouble(2) === nll1)
    assert(got(1).getLong(1) === 1 && got(1).getDouble(2) === nll2)
    // <2 tokens: zero bigrams, NULL score (not a fake 0.0)
    assert(got(2).getLong(1) === 0 && got(2).isNullAt(2))
  }

  test("chunkDocuments windows text with overlap, covering every character") {
    import spark.implicits._
    val text = ('a' to 'z').mkString * 10 // 260 chars
    val df = Seq((1L, text), (2L, "short"), (3L, "")).toDF("id", "text")
    val chunks = TextAnalysis.chunkDocuments(df, "id", "text",
      size = 100, overlap = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // 260 chars, window 100, step 80: chunks at 0, 80, 160 -> 3 windows
    val doc1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(_._2).toSeq === Seq(0L, 1L, 2L))
    assert(doc1(0)._3 === text.substring(0, 100))
    assert(doc1(1)._3 === text.substring(80, 180))
    assert(doc1(2)._3 === text.substring(160, 260))
    // adjacent chunks share exactly `overlap` characters
    assert(doc1(0)._3.takeRight(20) === doc1(1)._3.take(20))
    // reconstruction: stitching de-overlapped chunks rebuilds the document
    val rebuilt = doc1(0)._3 + doc1.drop(1).map(_._3.drop(20)).mkString
    assert(rebuilt === text)
    // short docs yield one whole-text chunk; empty docs one empty chunk
    assert(chunks.filter(_._1 == 2L).toSeq === Seq((2L, 0L, "short")))
    assert(chunks.filter(_._1 == 3L).toSeq === Seq((3L, 0L, "")))
    // invalid parameters refused
    intercept[IllegalArgumentException](
      TextAnalysis.chunkDocuments(df, "id", "text", size = 50, overlap = 50))
  }

  test("repeatedSpans finds planted verbatim overlap, merged maximally") {
    import spark.implicits._
    def words(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val shared = words("dup", 10) // 10 shared words -> positions of 3-grams
    val docs = Seq(
      (1L, s"${words("a", 5)} $shared ${words("b", 5)}"),
      (2L, s"${words("c", 3)} $shared"),
      (3L, words("unique", 20))).toDF("doc_id", "text")
    val spans = TextAnalysis.repeatedSpans(docs, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // doc 1: shared block occupies words 6..15 -> 3-gram hits 6..13, one span
    assert(spans.filter(_._1 == 1L).toSeq === Seq((1L, 6, 15, 8)))
    // doc 2: words 4..13 -> positions 4..11
    assert(spans.filter(_._1 == 2L).toSeq === Seq((2L, 4, 13, 8)))
    // unique doc: no spans
    assert(!spans.exists(_._1 == 3L))
  }

  test("dropRepeatedSpans cuts all occurrences, keeps the rest in order") {
    import spark.implicits._
    def words(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val shared = words("dup", 6)
    val docs = Seq(
      (1L, s"${words("a", 4)} $shared ${words("b", 4)}"),
      (2L, shared),                    // fully duplicated -> empty survivor
      (3L, words("solo", 10))).toDF("doc_id", "text")
    val out = TextAnalysis.dropRepeatedSpans(docs, k = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) === (s"${words("a", 4)} ${words("b", 4)}", 8L))
    assert(out(2L) === ("", 0L))
    assert(out(3L) === (words("solo", 10), 10L))
  }

  test("repeatedSpans reports within-doc repetition and separate islands") {
    import spark.implicits._
    val docs = Seq(
      // "x1 x2 x3" appears twice in the same doc, separated by unique words
      (1L, "x1 x2 x3 gap1 gap2 gap3 gap4 x1 x2 x3")).toDF("doc_id", "text")
    val spans = TextAnalysis.repeatedSpans(docs, k = 3)
      .orderBy($"start_word")
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(spans.toSeq === Seq((1, 3), (8, 10)))
  }
}
