package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BPE tokenizer: hand-computed merge sequence, encode/train agreement,
  * determinism, lossless letter coverage, monotone compression.
  */
class BpeSpec extends SparkSpec {

  private def corpus(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("merge sequence matches the hand-computed BPE on a closed corpus") {
    // words: aaab x2, ab x1
    // pair counts: (a,a)=4, (a,b)=3        -> merge 1: (a,a)
    // then [aa,a,b]x2 [a,b]x1: (aa,a)=2, (a,b)=3 -> merge 2: (a,b)
    // then [aa,ab]x2 [ab]x1: (aa,ab)=2     -> merge 3: (aa,ab)
    val m = Bpe.train(corpus("aaab aaab ab"), "text", numMerges = 3)
    assert(m.merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    // training words encode to single learned tokens
    val enc = Bpe.encode(corpus("aaab", "abab"), "text", m)
      .orderBy("id").select("bpe_tokens").collect()
      .map(_.getSeq[String](0).toList)
    assert(enc(0) === List("aaab"))
    // unseen word: greedy lowest-rank application, (ab)(ab)
    assert(enc(1) === List("ab", "ab"))
  }

  test("training exhausts pairs gracefully when numMerges exceeds the corpus") {
    val m = Bpe.train(corpus("ab ab"), "text", numMerges = 50)
    assert(m.merges === Seq(("a", "b")))
  }

  test("deterministic: same corpus trains the identical model twice") {
    val docs = graft.Engine.table(spark, sfDir, "documents")
    val m1 = Bpe.train(docs, "text", numMerges = 80, maxWords = 2000)
    val m2 = Bpe.train(docs, "text", numMerges = 80, maxWords = 2000)
    assert(m1.merges === m2.merges)
    assert(m1.merges.size === 80)
  }

  test("encoding is lossless over letters and null-safe") {
    val docs = graft.Engine.table(spark, sfDir, "documents").limit(50)
    val m = Bpe.train(docs, "text", numMerges = 100, maxWords = 2000)
    val enc = Bpe.encode(docs, "text", m)
    // concatenated tokens reproduce the word-split text exactly
    val bad = enc.withColumn("rebuilt", concat_ws("", col("bpe_tokens")))
      .withColumn("expected", concat_ws("",
        filter(split(lower(col("text")), "[^\\p{L}\\p{N}]+"),
          w => length(w) > 0)))
      .filter(col("rebuilt") =!= col("expected"))
    assert(bad.isEmpty, "token concatenation must reproduce the input words")
    val nulls = Bpe.encode(corpus(null.asInstanceOf[String], ""), "text", m)
      .select("n_bpe_tokens").collect().map(_.getInt(0)).toSeq
    assert(nulls === Seq(0, 0))
  }

  test("save/load round-trips the model and its encodings") {
    val m = Bpe.train(corpus("aaab aaab ab"), "text", numMerges = 3)
    val path = java.nio.file.Files.createTempDirectory("bpe_")
      .toString + "/model.json"
    Bpe.save(spark, m, path)
    val m2 = Bpe.load(spark, path)
    assert(m2.merges === m.merges)
    val enc = (x: Bpe.BpeModel) => Bpe.encode(corpus("aaab abab"), "text", x)
      .select("bpe_tokens").head.getSeq[String](0).toList
    assert(enc(m2) === enc(m))
  }

  test("more merges never increase the token count (training corpus)") {
    val docs = graft.Engine.table(spark, sfDir, "documents")
    val small = Bpe.train(docs, "text", numMerges = 50, maxWords = 5000)
    val big = Bpe.train(docs, "text", numMerges = 400, maxWords = 5000)
    assert(big.merges.take(50) === small.merges,
      "merge sequence must be a prefix-extension as numMerges grows")
    val nSmall = Bpe.encode(docs, "text", small)
      .agg(sum("n_bpe_tokens")).head.getLong(0)
    val nBig = Bpe.encode(docs, "text", big)
      .agg(sum("n_bpe_tokens")).head.getLong(0)
    assert(nBig < nSmall,
      s"400 merges ($nBig tokens) must compress beyond 50 merges ($nSmall)")
    // and tokens never exceed characters-in-words
    val chars = docs.select(explode(split(lower(col("text")),
      "[^\\p{L}\\p{N}]+")).as("w")).agg(sum(length(col("w")))).head.getLong(0)
    assert(nBig <= chars)
  }
}
