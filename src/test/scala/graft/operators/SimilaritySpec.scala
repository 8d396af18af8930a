package graft.operators

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Engine.table(spark, sfDir, "embeddings")

  test("cosine of a vector with itself is 1") {
    import spark.implicits._
    val d = emb.limit(5)
      .select(Similarity.cosine(
        transform($"embedding", _.cast("double")),
        transform($"embedding", _.cast("double"))).as("c"))
    d.collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("cosineTopK returns k ranked neighbors, self excluded") {
    import spark.implicits._
    val topk = Similarity.cosineTopK(emb, emb.filter($"vec_id" < 3), "vec_id", "embedding", 10)
    assert(topk.count() === 30)
    assert(topk.filter($"query_id" === $"item_id").count() === 0)
    // ranks are 1..10 per query and cos_sim is non-increasing in rank
    val r = topk.filter($"query_id" === 0).orderBy($"rnk").collect()
    assert(r.map(_.getInt(3)).toSeq === (1 to 10))
    val sims = r.map(_.getDouble(2))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("cosineTopK finds a planted identical vector at rank 1") {
    import spark.implicits._
    val clone = emb.filter($"vec_id" === 7)
      .withColumn("vec_id", lit(900000L))
    val corpus = emb.unionByName(clone)
    val topk = Similarity.cosineTopK(corpus, emb.filter($"vec_id" === 7),
      "vec_id", "embedding", 3)
    val first = topk.filter($"rnk" === 1).head()
    assert(first.getLong(1) === 900000L)
    assert(math.abs(first.getDouble(2) - 1.0) < 1e-4)
  }

  test("annLsh places identical vectors in the same bucket (recall on clones)") {
    import spark.implicits._
    val clones = emb.filter($"vec_id" < 10)
      .withColumn("vec_id", $"vec_id" + 900000L)
    val corpus = emb.unionByName(clones)
    val ann = Similarity.annLsh(corpus, emb.filter($"vec_id" < 10),
      "vec_id", "embedding", k = 5, nPlanes = 12)
    // identical vector hashes to the identical bucket -> always retrievable
    val hits = ann.filter($"item_id" === $"query_id" + 900000L && $"rnk" === 1)
    assert(hits.count() === 10)
  }

  test("ivfTopK recalls most of brute-force top-k") {
    import spark.implicits._
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"item_id")
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nLists = 8, nProbe = 6)
    assert(ivf.groupBy($"query_id").count().collect().forall(_.getLong(1) <= 5))
    val recalled = ivf.select($"query_id", $"item_id").intersect(exact).count()
    // probing 6/8 lists: most exact neighbors are recalled
    assert(recalled >= 25, s"recall $recalled/50 too low")
  }

  test("embeddingNearDups finds planted clones via LSH buckets") {
    import spark.implicits._
    val clones = emb.filter($"vec_id" < 5).withColumn("vec_id", $"vec_id" + 900000L)
    val corpus = emb.unionByName(clones)
    val dups = Similarity.embeddingNearDups(corpus, "vec_id", "embedding",
      threshold = 0.999)
    val planted = dups.filter($"id_b" === $"id_a" + 900000L)
    assert(planted.count() === 5)
    assert(planted.agg(min($"cos_sim")).head().getDouble(0) >= 0.999)
  }

  test("multi-probe LSH recovers recall lost to narrow buckets") {
    import spark.implicits._
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"item_id")
    def recall(flips: Int): Long =
      Similarity.annLsh(emb, queries, "vec_id", "embedding", k = 5,
        nPlanes = 6, dims = 64, probeFlips = flips)
        .select($"query_id", $"item_id").intersect(exact).count()
    val single = recall(0)
    val multi = recall(1)
    // at 6 planes buckets are narrow for this corpus (single-probe recalls
    // ~4/100); probing the 6 Hamming-1 buckets per query must recover
    // strictly (here ~6x) more of the brute-force top-k
    assert(multi > single, s"multi-probe $multi not above single-probe $single")
    assert(multi >= 20, s"multi-probe recall $multi/100 too low")
  }

  test("vector-avg centroid is a single aggregate even at 768 dims") {
    import spark.implicits._
    // every vector in a label group is identical -> cosine to centroid = 1
    val wide = spark.range(90).select(
      $"id".as("vec_id"), ($"id" % 3).as("label"),
      transform(sequence(lit(1), lit(768)),
        i => (i * (($"id" % 3) + 1)).cast("double")).as("embedding"))
    val d = Similarity.labelCentroidSimilarity(wide, "vec_id", "embedding", "label")
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("element_at"), "centroid still expands per-dimension aggs")
    val scores = d.select($"cos_to_centroid").as[Double].collect()
    assert(scores.length === 90)
    scores.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }

  test("labelCentroidSimilarity yields a bounded score per vector") {
    import spark.implicits._
    val d = Similarity.labelCentroidSimilarity(emb, "vec_id", "embedding", "label")
    assert(d.count() === emb.count())
    val mm = d.agg(min($"cos_to_centroid"), max($"cos_to_centroid")).head()
    assert(mm.getDouble(0) >= -1.0 && mm.getDouble(1) <= 1.0)
  }
}
