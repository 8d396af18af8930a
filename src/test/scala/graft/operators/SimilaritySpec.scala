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
      "vec_id", "embedding", k = 5, dims = 64, nPlanes = 12)
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

  test("ivfWriteIndex persists list-partitioned lists; indexed probe prunes partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx_").toString
    Similarity.ivfWriteIndex(emb, "vec_id", "embedding", dir, nLists = 8, iters = 1)
    // one directory per inverted list + a centroid sidecar
    val listDirs = new java.io.File(dir + "/lists").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("list_id="))
    assert(listDirs.length > 1 && listDirs.length <= 8)
    assert(new java.io.File(dir + "/centroids").exists())

    // single query, nProbe=2 of 8: the scan must plan STATIC partition
    // pruning on list_id with at most 2 probed lists
    val res = Similarity.ivfTopKIndexed(emb.filter($"vec_id" === 0), dir,
      "vec_id", "embedding", k = 5, nProbe = 2)
    val plan = res.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters"),
      "indexed scan lost its partition filter — the probe would read every list")
    val inList = "list_id[^ ]* IN \\(([-0-9,]+)\\)".r
      .findFirstMatchIn(plan).map(_.group(1).split(",").length)
    assert(inList.exists(_ <= 2),
      s"expected <=2 probed lists in the partition filter, plan:\n" +
        plan.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))

    // parity: indexed recall matches the unindexed path's bound vs brute force
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"item_id")
    val idx = Similarity.ivfTopKIndexed(queries, dir, "vec_id", "embedding",
      k = 5, nProbe = 6)
    val recalled = idx.select($"query_id", $"item_id").intersect(exact).count()
    assert(recalled >= 25, s"indexed recall $recalled/50 too low")
    // reading a persisted index is deterministic
    val again = Similarity.ivfTopKIndexed(queries, dir, "vec_id", "embedding",
      k = 5, nProbe = 6)
    assert(idx.exceptAll(again).isEmpty && again.exceptAll(idx).isEmpty)
  }

  test("embeddingNearDups finds planted clones via LSH buckets") {
    import spark.implicits._
    val clones = emb.filter($"vec_id" < 5).withColumn("vec_id", $"vec_id" + 900000L)
    val corpus = emb.unionByName(clones)
    val dups = Similarity.embeddingNearDups(corpus, "vec_id", "embedding",
      threshold = 0.999, dims = 64)
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
        dims = 64, nPlanes = 6, probeFlips = flips)
        .select($"query_id", $"item_id").intersect(exact).count()
    val single = recall(0)
    val multi = recall(1)
    // at 6 planes buckets are narrow for this corpus (single-probe recalls
    // ~4/100); probing the 6 Hamming-1 buckets per query must recover
    // strictly (here ~6x) more of the brute-force top-k
    assert(multi > single, s"multi-probe $multi not above single-probe $single")
    assert(multi >= 20, s"multi-probe recall $multi/100 too low")
  }

  test("ivfTopK assignment is a shuffle-free map-side projection") {
    import spark.implicits._
    val vecs = emb.select($"vec_id".as("item_id"), $"embedding".as("__cv"))
    val cents = emb.filter($"vec_id" < 4)
      .select($"vec_id", $"embedding".cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val assigned = Similarity.assignToCentroids(vecs, cents, "list_id")
    val plan = assigned.queryExecution.executedPlan.toString
    // one Lloyd half-step = scan + project; no shuffle, no sort, no window
    assert(!plan.contains("Exchange"), s"assignment shuffles:\n$plan")
    assert(!plan.contains("Window"), s"assignment window-based:\n$plan")
    assert(!plan.contains("Sort"), s"assignment sorts:\n$plan")
    // exactly one row per vector, assigned to a valid centroid
    assert(assigned.count() === emb.count())
    assert(assigned.filter($"list_id" >= 4 || $"list_id" < 0).count() === 0)
    // argmax is correct: matches the brute-force best centroid per vector
    val centsDf = cents.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("__cent", "__centv")
    val brute = vecs.crossJoin(broadcast(centsDf))
      .withColumn("s", Similarity.cosine($"__cv", $"__centv"))
      .groupBy($"item_id").agg(max_by($"__cent", struct($"s", -$"__cent")).as("want"))
    val mismatch = assigned.join(brute, "item_id")
      .filter($"list_id" =!= $"want").count()
    assert(mismatch === 0)
  }

  test("ivfTopK iters=3 re-refines without geometric lineage blowup") {
    import spark.implicits._
    val queries = emb.filter($"vec_id" < 5)
    // correctness at iters=3 (centroids refined twice more): still top-k rows,
    // and runtime stays in the same regime as iters=1 (checkpointed centroids
    // mean each extra iter adds one assignment + one tiny agg, not a
    // re-execution of the whole prior chain)
    val t1 = System.nanoTime()
    val r1 = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nLists = 8, nProbe = 6, iters = 1).count()
    val d1 = (System.nanoTime() - t1) / 1e9
    val t3 = System.nanoTime()
    val r3 = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nLists = 8, nProbe = 6, iters = 3).count()
    val d3 = (System.nanoTime() - t3) / 1e9
    assert(r1 === 25 && r3 === 25)
    // geometric re-execution would be >= 4x; linear growth with generous
    // jitter headroom stays under 3x
    assert(d3 < d1 * 3 + 2.0, s"iters=3 took ${d3}s vs iters=1 ${d1}s")
  }

  test("multi-probe embeddingNearDups recovers pairs split by one plane") {
    import spark.implicits._
    val sub = emb.filter($"vec_id" < 150)
    // brute-force truth: all pairs above threshold
    val a = sub.select($"vec_id".as("id_a"), $"embedding".as("__va"))
    val b = sub.select($"vec_id".as("id_b"), $"embedding".as("__vb"))
    val truth = a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("cs", Similarity.cosine($"__va", $"__vb"))
      .filter($"cs" >= 0.55).select($"id_a", $"id_b")
    def found(flips: Int): Long =
      Similarity.embeddingNearDups(sub, "vec_id", "embedding",
        threshold = 0.55, dims = 64, nPlanes = 12, probeFlips = flips)
        .select($"id_a", $"id_b").intersect(truth).count()
    val single = found(0)
    val multi = found(1)
    assert(multi >= single,
      s"multi-probe pairs $multi below single-probe $single")
    val n = truth.count()
    assert(multi > single || single == n,
      s"multi-probe recovered nothing extra ($single/$n already)")
  }

  test("int8 quantized cosine tracks exact cosine closely") {
    import spark.implicits._
    val a = emb.filter($"vec_id" < 40).select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = emb.filter($"vec_id" >= 40 && $"vec_id" < 80)
      .select($"vec_id".as("ib"), $"embedding".as("vb"))
    val err = a.crossJoin(b)
      .select(abs(
        graft.functions.VectorColumns.int8Cosine(
          graft.functions.VectorColumns.int8Quantize($"va"),
          graft.functions.VectorColumns.int8Quantize($"vb")) -
        Similarity.cosine($"va", $"vb")).as("e"))
      .agg(max($"e")).head().getDouble(0)
    assert(err < 0.02, s"int8 cosine error $err too large")
  }

  test("cosineTopKInt8 recalls nearly all of exact top-k after refine") {
    import spark.implicits._
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"item_id")
    val quant = Similarity.cosineTopKInt8(emb, queries, "vec_id", "embedding",
      k = 5, refine = 3)
    assert(quant.groupBy($"query_id").count().collect().forall(_.getLong(1) === 5))
    val recalled = quant.select($"query_id", $"item_id").intersect(exact).count()
    assert(recalled >= 45, s"int8 recall $recalled/50 too low")
    // exact re-rank means surviving pairs carry TRUE cosine: spot-check rank-1
    val e1 = exact.count()
    assert(e1 === 50)
  }

  test("pqTopK: 8-byte codes recall most of exact top-k after refine") {
    import spark.implicits._
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"item_id")
    val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      k = 5, dims = 64, m = 8, kCodes = 64, refine = 8)
    assert(pq.groupBy($"query_id").count().collect().forall(_.getLong(1) === 5))
    val recalled = pq.select($"query_id", $"item_id").intersect(exact).count()
    // 8 subspaces x 64 codes on 64-dim: coarse but refine=4 recovers most
    assert(recalled >= 35, s"pq recall $recalled/50 too low")
    // determinism: training is RNG-free, so two runs agree exactly
    val again = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      k = 5, dims = 64, m = 8, kCodes = 64, refine = 8)
    assert(pq.exceptAll(again).isEmpty && again.exceptAll(pq).isEmpty)
  }

  test("pq ADC dot approximates cosine on normalized vectors") {
    import spark.implicits._
    val cb = Similarity.trainPq(emb, "vec_id", "embedding", dims = 64,
      m = 8, kCodes = 64, sampleN = 500)
    val V = graft.functions.VectorColumns
    val pairs = emb.filter($"vec_id" < 30)
      .select($"vec_id".as("ia"), $"embedding".as("va"))
      .crossJoin(emb.filter($"vec_id" >= 30 && $"vec_id" < 60)
        .select($"vec_id".as("ib"), $"embedding".as("vb")))
    val err = pairs.select(abs(
        V.pqAdcDot(V.pqEncode(V.l2Normalize($"va"), cb),
          V.pqLut(V.l2Normalize($"vb"), cb), cb(0).length) -
        Similarity.cosine($"va", $"vb")).as("e"))
      .agg(avg($"e"), max($"e")).head()
    assert(err.getDouble(0) < 0.08, s"mean ADC error ${err.getDouble(0)}")
    assert(err.getDouble(1) < 0.35, s"max ADC error ${err.getDouble(1)}")
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

  test("kMeansClusters assigns every vector to one of k clusters, deterministically") {
    import spark.implicits._
    val a = Similarity.kMeansClusters(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(a.count() === emb.count())
    assert(a.select($"cluster_id").distinct().count() <= 8)
    // assignment is the argmax over the same trained centroids -> re-running
    // the whole operator reproduces it exactly
    val b = Similarity.kMeansClusters(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("kMeansClusters separates well-separated planted clusters") {
    import spark.implicits._
    // three orthogonal directions, 30 identical points each — identical
    // inputs must share an assignment (deterministic argmax), so each
    // ground-truth group maps to exactly one learned cluster
    val pts = spark.range(90).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(15)), i =>
        when(($"id" % 3) === i % 3, lit(10.0)).otherwise(lit(0.0))).as("embedding"))
    val a = Similarity.kMeansClusters(pts, "vec_id", "embedding", k = 3, iters = 3)
    val purity = a.withColumn("truth", $"vec_id" % 3)
      .groupBy($"truth").agg(countDistinct($"cluster_id").as("n"))
      .agg(max($"n")).head().getLong(0)
    assert(purity === 1L, "a ground-truth group was split across clusters")
    // orthogonal groups with multi-group seeds separate fully
    assert(a.select($"cluster_id").distinct().count() === 3)
    // members of a group sit ON their centroid after refinement
    assert(a.agg(min($"cos_to_centroid")).head().getDouble(0) > 0.999)
  }

  test("semanticDedup flags planted near-identical vectors, keeps the lowest id") {
    import spark.implicits._
    val clones = emb.filter($"vec_id" < 5)
      .withColumn("vec_id", $"vec_id" + 900000L)
    val corpus = emb.unionByName(clones)
    val d = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      k = 8, tau = 0.999, iters = 2)
    assert(d.count() === corpus.count())
    // each clone is cosine-1 to its source -> flagged, with the source as
    // witness; the source itself (lower id) stays kept
    val dups = d.filter($"is_dup").select($"vec_id", $"dup_of").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach { i =>
      assert(dups.get(900000L + i).contains(i), s"clone of $i not flagged")
      assert(!dups.contains(i), s"source $i wrongly flagged")
    }
  }

  test("semanticDedup with an impossible threshold flags nothing") {
    import spark.implicits._
    val d = Similarity.semanticDedup(emb, "vec_id", "embedding",
      k = 8, tau = 1.5, iters = 1)
    assert(d.filter($"is_dup").count() === 0)
    assert(d.filter($"dup_of".isNotNull).count() === 0)
  }

  test("semanticDedup cluster cap bounds a degenerate corpus and still converges") {
    import spark.implicits._
    // 5000 IDENTICAL vectors: k-means cannot separate them, so without a
    // cap every pair lands in one cluster — 12.5M comparisons here,
    // corpus²/2 at scale. With cap=100 the cluster splits into 50 hash
    // sub-clusters (≤100²/2 pairs each) + one 50-survivor refinement pass.
    val degenerate = spark.range(5000)
      .select($"id".as("vec_id"),
        array(lit(1.0f), lit(0.0f), lit(0.5f), lit(0.25f)).as("embedding"))
    val d = Similarity.semanticDedup(degenerate, "vec_id", "embedding",
      k = 8, tau = 0.999, iters = 1, maxClusterSize = 100).cache()
    try {
      assert(d.count() === 5000)
      // the refinement pass collapses sub-cluster survivors: exactly the
      // global lowest id survives, everything else is flagged
      val kept = d.filter(!$"is_dup").select($"vec_id").collect().map(_.getLong(0))
      assert(kept.toSeq === Seq(0L),
        s"expected only id 0 kept, got ${kept.sorted.take(10).toSeq}...")
      assert(d.filter($"is_dup").count() === 4999)
      // witnesses are always lower ids (keep-the-first is preserved)
      assert(d.filter($"is_dup" && $"dup_of" >= $"vec_id").count() === 0)
    } finally d.unpersist()
    // a mixed corpus: the cap leaves within-cap clusters byte-identical to
    // the uncapped answer
    val mixed = emb.limit(200)
    val uncapped = Similarity.semanticDedup(mixed, "vec_id", "embedding",
      k = 8, tau = 0.98, iters = 2)
    val capped = Similarity.semanticDedup(mixed, "vec_id", "embedding",
      k = 8, tau = 0.98, iters = 2, maxClusterSize = 10000)
    val render = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(render(capped) === render(uncapped))
  }
}
