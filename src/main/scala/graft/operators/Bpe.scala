package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: corpus-trained merges + distributed
  * encoding — the token-counting / budget-estimation primitive of a
  * training-data pipeline (the role a fixed tiktoken vocabulary plays in
  * production corpus accounting, here trained on the corpus itself).
  *
  * Scale design (100 TB): training NEVER iterates the raw corpus. It runs
  * ONE distributed word-count (a single keyed shuffle at any corpus size),
  * caps the result at `maxWords` by frequency, and runs the merge loop
  * driver-side over that bounded word-frequency table — the standard
  * public BPE-training formulation (Sennrich et al. 2016 operate on word
  * counts; SentencePiece/HF tokenizers train the same way). Encoding is a
  * per-row pure function under a broadcast-size model with a per-task
  * word cache (Zipf: most words repeat), so it is embarrassingly parallel
  * and shuffle-free. A UDF is the right tool here for the same reason as
  * the media codecs: the merge loop is inherently iterative per word —
  * there is no relational formulation that beats it.
  */
object Bpe {

  /** Ordered merge list; rank = position. Small (numMerges entries) —
    * serializes into task closures like a broadcast literal.
    */
  final case class BpeModel(merges: Seq[(String, String)]) extends Serializable {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  /** Lowercased letter/digit word stream — the shared tokenizer front end
    * of train and encode (they must agree or counts drift).
    */
  private def wordsOf(textCol: Column): Column =
    split(lower(textCol), "[^\\p{L}\\p{N}]+")

  /** Trains `numMerges` BPE merges from the corpus word-frequency table.
    *
    * Deterministic by construction: the word table is collected with a
    * (count DESC, word ASC) order before the cap, and each iteration
    * breaks pair-count ties lexicographically — two runs over the same
    * corpus produce identical models (golden-stable).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 50000): BpeModel = {
    require(numMerges >= 1, "numMerges must be >= 1")
    // the one distributed pass: word -> count, capped by frequency
    val wordCounts: Array[(String, Long)] = df
      .select(explode(wordsOf(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))

    // driver merge loop over the bounded vocab (counts, not corpus)
    var vocab: Map[Vector[String], Long] = wordCounts
      .map { case (w, c) => w.map(_.toString).toVector -> c }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val merges = Vector.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max count, ties broken lexicographically — determinism
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.groupMapReduce {
          case (syms, _) => mergePair(syms, best) }(_._2)(_ + _)
        i += 1
      }
    }
    BpeModel(merges.result())
  }

  /** Persist a trained model as one JSON file (Hadoop FS — HDFS/S3 roots
    * work like local paths). A 100 TB pipeline trains ONCE on the corpus
    * word table and ships the model to every later encode stage by path.
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: BpeModel,
      path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(org.json4s.jackson.Serialization.write(
      model.merges.map(m => Seq(m._1, m._2)))(org.json4s.DefaultFormats)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): BpeModel = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val txt = try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val pairs = org.json4s.jackson.Serialization.read[List[List[String]]](txt)
    BpeModel(pairs.map { case List(a, b) => (a, b)
      case other => sys.error(s"malformed merge entry: $other") })
  }

  /** One left-to-right non-overlapping replacement pass of `pair`. */
  private def mergePair(syms: Vector[String],
      pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += (pair._1 + pair._2); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Greedy BPE encode of one word: repeatedly apply the present pair with
    * the LOWEST rank (all its occurrences, left to right) until none of
    * the word's adjacent pairs is in the model — the standard apply rule,
    * which reproduces the training segmentation on training words.
    */
  private def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Vector[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    var go = syms.length > 1
    while (go) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (best == null) go = false
      else {
        syms = mergePair(syms, best)
        go = syms.length > 1
      }
    }
    syms
  }

  /** Adds `bpe_tokens` (array) and `n_bpe_tokens` to `df`. The per-task
    * word cache is size-bounded; on overflow it resets rather than evicts
    * (cheap, and a >100k-distinct-word partition has left Zipf territory
    * anyway).
    */
  def encode(df: DataFrame, textCol: String, model: BpeModel): DataFrame = {
    val enc = udf(new BpeEncoder(model))
    df.withColumn("bpe_tokens", enc(col(textCol)))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")))
  }

  /** Serializable encode closure with a per-task memo (udf functions are
    * deserialized per task, so the cache is task-local — no sharing, no
    * locking).
    */
  private final class BpeEncoder(model: BpeModel)
      extends (String => Array[String]) with Serializable {
    @transient private lazy val cache =
      mutable.HashMap.empty[String, Vector[String]]
    @transient private lazy val ranks = model.ranks
    override def apply(text: String): Array[String] = {
      if (text == null) return Array.empty
      if (cache.size > 100000) cache.clear()
      // Locale.ROOT: a tr_TR-default executor would fold I to dotless ı,
      // producing words the trained merge table never saw (train uses
      // Spark's locale-independent lower())
      text.toLowerCase(java.util.Locale.ROOT)
        .split("[^\\p{L}\\p{N}]+").iterator
        .filter(_.nonEmpty)
        .flatMap(w => cache.getOrElseUpdate(w, encodeWord(w, ranks)))
        .toArray
    }
  }
}
