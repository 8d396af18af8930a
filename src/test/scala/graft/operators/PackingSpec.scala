package graft.operators

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  private lazy val docs = TextAnalysis.withTokenCount(
    Engine.table(spark, sfDir, "documents"))
    .select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"))

  private val capacity = 256

  test("every document lands in exactly one pack; packs respect capacity") {
    val packed = Packing.packSequences(docs, "doc_id", "n_tokens", capacity,
      numBuckets = 8)
    assert(packed.count() === docs.count())
    assert(packed.select("doc_id").distinct().count() === docs.count())
    val stats = Packing.packStats(packed, "n_tokens", capacity)
    // non-overflow packs fit; overflow packs are single oversize docs
    assert(stats.filter(!col("overflow") && col("n_tokens") > capacity).count() === 0)
    val over = packed.filter(col("overflow"))
    assert(over.filter(col("n_tokens") <= capacity).count() === 0)
    assert(stats.filter(col("overflow") && col("n_docs") > 1).count() === 0)
  }

  test("best-fit-decreasing packs densely (near the token lower bound)") {
    val packed = Packing.packSequences(docs, "doc_id", "n_tokens", capacity,
      numBuckets = 8)
    val totalTokens = docs.agg(sum(col("n_tokens"))).head().getLong(0)
    val nPacks = packed.select("pack_id").distinct().count()
    val lowerBound = math.ceil(totalTokens.toDouble / capacity)
    // 8 independent buckets each waste at most a partial pack; BFD is
    // near-optimal on doc-sized items
    assert(nPacks <= lowerBound * 1.25 + 8,
      s"$nPacks packs vs lower bound $lowerBound")
    // positions are dense 0..n_docs-1 within each pack
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("pack_id"))
    assert(packed
      .withColumn("mx", max(col("pack_pos")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("mx") =!= col("n") - 1).count() === 0)
  }

  test("packing is deterministic and independent of input partitioning") {
    val a = Packing.packSequences(docs, "doc_id", "n_tokens", capacity, 8)
    val b = Packing.packSequences(docs.repartition(17), "doc_id", "n_tokens",
      capacity, 8)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("string ids survive packing in their original type and value") {
    import spark.implicits._
    val named = Seq(("doc-alpha", 100), ("doc-beta", 120), ("doc-gamma", 90),
      ("550e8400-e29b-41d4-a716-446655440000", 200))
      .toDF("doc_id", "n_tokens")
    val packed = Packing.packSequences(named, "doc_id", "n_tokens", 256, 2)
    assert(packed.schema("doc_id").dataType ===
      org.apache.spark.sql.types.StringType)
    assert(packed.filter($"doc_id".isNull).count() === 0)
    assert(packed.select($"doc_id").as[String].collect().toSet ===
      Set("doc-alpha", "doc-beta", "doc-gamma",
        "550e8400-e29b-41d4-a716-446655440000"))
    // every doc assigned exactly once, capacity respected
    assert(packed.count() === 4)
    val stats = Packing.packStats(packed, "n_tokens", 256)
    assert(stats.filter(!$"overflow" && $"n_tokens" > 256).count() === 0)
  }

  test("oversize documents get flagged solo packs") {
    import spark.implicits._
    val tiny = Seq((1L, 100), (2L, 500), (3L, 100), (4L, 60))
      .toDF("doc_id", "n_tokens")
    val packed = Packing.packSequences(tiny, "doc_id", "n_tokens", 256, 1)
    assert(packed.filter($"doc_id" === 2L).head().getAs[Boolean]("overflow"))
    // 100+100+60 = 260 > 256: the 60 can't join both 100s -> 2 normal packs
    val normal = Packing.packStats(packed, "n_tokens", 256).filter(!$"overflow")
    assert(normal.count() === 2)
    assert(normal.agg(max($"n_tokens")).head().getLong(0) <= 256)
  }
}
