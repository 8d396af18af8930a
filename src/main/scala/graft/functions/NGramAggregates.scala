package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Hive's n-gram frequency estimation aggregates
  * (ref ql/src/java/org/apache/hadoop/hive/ql/udf/generic/
  * GenericUDAFnGrams.java and GenericUDAFContextNGrams.java).
  *
  * ngrams(sentences, n, k, pf): top-k most frequent word n-grams across an
  * array<array<string>> column. context_ngrams(sentences, context, k, pf):
  * top-k fillers for the null slots of a context pattern.
  *
  * Hive bounds memory with precision_factor * k heap entries; we keep the
  * same contract (buffer pruned to pf*k entries on update/merge) so the
  * aggregate is safe on 100 TB corpora. Registered as Spark `Aggregator`s —
  * the exact analog of GenericUDAFEvaluator's
  * iterate/terminatePartial/merge/terminate (SURVEY §2.3).
  */
object NGramAggregates {

  case class NGramFreq(ngram: Seq[String], estfrequency: Double)

  private def topK(m: Map[Seq[String], Long], k: Int): Seq[NGramFreq] =
    m.toSeq.sortBy { case (g, c) => (-c, g.mkString(" ")) }.take(k)
      .map { case (g, c) => NGramFreq(g, c.toDouble) }

  private def prune(m: Map[Seq[String], Long], cap: Int): Map[Seq[String], Long] =
    if (m.size <= cap) m
    else m.toSeq.sortBy { case (g, c) => (-c, g.mkString(" ")) }.take(cap).toMap

  /** ngrams aggregator: IN = (sentences, n, k, pf). */
  class NGrams extends Aggregator[(Seq[Seq[String]], Int, Int, Int),
      (Map[Seq[String], Long], Int, Int), Seq[NGramFreq]] {
    def zero: (Map[Seq[String], Long], Int, Int) = (Map.empty, 0, 0)
    def reduce(b: (Map[Seq[String], Long], Int, Int),
        in: (Seq[Seq[String]], Int, Int, Int)): (Map[Seq[String], Long], Int, Int) = {
      val (sentences, n, k, pf) = in
      var m = b._1
      if (sentences != null) sentences.foreach { sent =>
        if (sent != null && sent.length >= n)
          sent.sliding(n).foreach { g => m = m.updated(g, m.getOrElse(g, 0L) + 1L) }
      }
      (prune(m, math.max(1, k * math.max(1, pf)) * 2), k, math.max(1, pf))
    }
    def merge(a: (Map[Seq[String], Long], Int, Int),
        b: (Map[Seq[String], Long], Int, Int)): (Map[Seq[String], Long], Int, Int) = {
      val m = b._1.foldLeft(a._1) { case (acc, (g, c)) =>
        acc.updated(g, acc.getOrElse(g, 0L) + c)
      }
      val k = math.max(a._2, b._2); val pf = math.max(math.max(a._3, b._3), 1)
      (prune(m, math.max(1, k * pf) * 2), k, pf)
    }
    def finish(b: (Map[Seq[String], Long], Int, Int)): Seq[NGramFreq] =
      topK(b._1, if (b._2 <= 0) 10 else b._2)
    def bufferEncoder: Encoder[(Map[Seq[String], Long], Int, Int)] =
      Encoders.kryo[(Map[Seq[String], Long], Int, Int)]
    def outputEncoder: Encoder[Seq[NGramFreq]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[NGramFreq]]()
  }

  /** context_ngrams aggregator: IN = (sentences, context-with-nulls, k, pf).
    * Context slots that are null are wildcards; the returned n-grams are the
    * wildcard fillers (Hive semantics).
    */
  class ContextNGrams extends Aggregator[(Seq[Seq[String]], Seq[String], Int, Int),
      (Map[Seq[String], Long], Int, Int), Seq[NGramFreq]] {
    def zero: (Map[Seq[String], Long], Int, Int) = (Map.empty, 0, 0)
    def reduce(b: (Map[Seq[String], Long], Int, Int),
        in: (Seq[Seq[String]], Seq[String], Int, Int)): (Map[Seq[String], Long], Int, Int) = {
      val (sentences, context, k, pf) = in
      var m = b._1
      if (sentences != null && context != null && context.nonEmpty) {
        val n = context.length
        sentences.foreach { sent =>
          if (sent != null && sent.length >= n) sent.sliding(n).foreach { win =>
            val ok = win.zip(context).forall { case (w, c) => c == null || c == w }
            if (ok) {
              val filler = win.zip(context).collect { case (w, c) if c == null => w }
              m = m.updated(filler, m.getOrElse(filler, 0L) + 1L)
            }
          }
        }
      }
      (prune(m, math.max(1, k * math.max(1, pf)) * 2), k, math.max(1, pf))
    }
    def merge(a: (Map[Seq[String], Long], Int, Int),
        b: (Map[Seq[String], Long], Int, Int)): (Map[Seq[String], Long], Int, Int) = {
      val m = b._1.foldLeft(a._1) { case (acc, (g, c)) =>
        acc.updated(g, acc.getOrElse(g, 0L) + c)
      }
      val k = math.max(a._2, b._2); val pf = math.max(math.max(a._3, b._3), 1)
      (prune(m, math.max(1, k * pf) * 2), k, pf)
    }
    def finish(b: (Map[Seq[String], Long], Int, Int)): Seq[NGramFreq] =
      topK(b._1, if (b._2 <= 0) 10 else b._2)
    def bufferEncoder: Encoder[(Map[Seq[String], Long], Int, Int)] =
      Encoders.kryo[(Map[Seq[String], Long], Int, Int)]
    def outputEncoder: Encoder[Seq[NGramFreq]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[NGramFreq]]()
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("ngrams", org.apache.spark.sql.functions.udaf(new NGrams))
    spark.udf.register("context_ngrams",
      org.apache.spark.sql.functions.udaf(new ContextNGrams))
  }
}
