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

  test("labelCentroidSimilarity yields a bounded score per vector") {
    import spark.implicits._
    val d = Similarity.labelCentroidSimilarity(emb, "vec_id", "embedding", "label")
    assert(d.count() === emb.count())
    val mm = d.agg(min($"cos_to_centroid"), max($"cos_to_centroid")).head()
    assert(mm.getDouble(0) >= -1.0 && mm.getDouble(1) <= 1.0)
  }
}
