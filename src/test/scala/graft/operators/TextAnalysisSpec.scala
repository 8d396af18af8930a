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
}
