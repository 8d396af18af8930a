package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorColumns

/** Similarity search over embedding columns (array<float>).
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the (small) query
  * set against the corpus, vector math in primitive-loop Catalyst expressions
  * (graft.functions.VectorExpressions), followed by a per-query top-k that
  * Spark plans as WindowGroupLimit (partial top-k BEFORE the shuffle, k rows
  * per partition per query cross the wire, not the corpus).
  *
  * Scale path: random-hyperplane LSH bucketing — deterministic hyperplanes
  * derived from a seed, signature computed map-side, candidates restricted to
  * same-bucket rows (equi-join on bucket id), then exact cosine re-rank.
  */
object Similarity {

  /** Dot product (primitive loop; accepts float or double arrays). */
  def dot(a: Column, b: Column): Column = VectorColumns.dot(a, b)

  def l2Norm(a: Column): Column = VectorColumns.l2Norm(a)

  def cosine(a: Column, b: Column): Column = VectorColumns.cosine(a, b)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding self-matches by id). Query side must be small enough
    * to broadcast; the corpus side streams partition-parallel with no shuffle
    * until the k-row-per-partition window limit.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = c.join(broadcast(q), col("item_id") =!= col("query_id"))
      .withColumn("cos_sim", cosine(col("__qv"), col("__cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("item_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("item_id"), round(col("cos_sim"), 5).as("cos_sim"),
        col("rnk"))
  }

  /** Random-hyperplane LSH signature: `nPlanes` sign bits packed in a long.
    * `dims` must match the embedding dimensionality.
    */
  def lshSignature(vec: Column, nPlanes: Int, dims: Int, seed: Long): Column =
    VectorColumns.hyperplaneSignature(vec,
      VectorColumns.planeMatrix(nPlanes, dims, seed))

  /** ANN via LSH buckets: candidates share the signature bucket; exact
    * cosine re-rank inside the bucket. Trades recall for a shuffle keyed on
    * the bucket id instead of a full cross join.
    *
    * `dims` is the embedding dimensionality and is required — deriving it
    * from the data would cost a driver-side read of one row on every call.
    * `probeFlips = 1` enables multi-probe: each query
    * additionally probes every bucket at Hamming distance 1 from its own
    * (the nPlanes single-bit flips) — the classic multi-probe LSH recall
    * recovery (Lv et al., VLDB'07) at the cost of nPlanes+1 probe keys per
    * query instead of wider buckets. Only the (small, broadcast) query side
    * fans out; the corpus is still bucketed once.
    */
  def annLsh(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, dims: Int, nPlanes: Int = 12, seed: Long = 42L,
      probeFlips: Int = 0): DataFrame = {
    require(probeFlips >= 0 && probeFlips <= 1,
      "probeFlips: 0 (exact bucket) or 1 (probe all single-bit flips)")
    require(dims > 0, "dims must be the embedding dimensionality")
    val d = dims
    val sig = (c: Column) => lshSignature(c, nPlanes, d, seed)
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("__cv"))
      .withColumn("bucket", sig(col("__cv")))
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__sig", sig(col("__qv")))
    val q =
      if (probeFlips == 0) q0.withColumn("bucket", col("__sig")).drop("__sig")
      else q0.withColumn("bucket", explode(array(
          (Seq(col("__sig")) ++
            (0 until nPlanes).map(i => col("__sig").bitwiseXOR(lit(1L << i)))): _*)))
        .drop("__sig")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("item_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("item_id") =!= col("query_id"))
      // a pair can surface through several probe buckets — dedupe before rank
      .select(col("query_id"), col("item_id"), col("__qv"), col("__cv"))
      .dropDuplicates("query_id", "item_id")
      .withColumn("cos_sim", cosine(col("__qv"), col("__cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("item_id"), round(col("cos_sim"), 5).as("cos_sim"),
        col("rnk"))
  }

  /** Nearest-centroid assignment (one Lloyd half-step) as a pure map-side
    * projection: the centroid set is tiny (nLists vectors), so it ships as a
    * literal matrix inside a codegen'd cosine-argmax expression
    * ([[graft.functions.NearestCentroid]]). ZERO shuffle per pass — strictly
    * better than both the row_number-window (corpus sort-shuffle) and a
    * groupBy-argmax (corpus shuffle) formulation. Ties break to the lowest
    * centroid id (`cents` sorted by id).
    */
  private[operators] def assignToCentroids(vecs: DataFrame,
      cents: Array[(Long, Array[Double])], out: String): DataFrame = {
    val sorted = cents.sortBy(_._1)
    vecs.withColumn(out, graft.functions.VectorColumns.nearestCentroid(
      col("__cv"), sorted.map(_._2), sorted.map(_._1)))
  }

  /** IVF-style ANN: the corpus is clustered into `nLists` inverted lists
    * around deterministic seed centroids (one mean-refinement pass); each
    * query probes its `nProbe` nearest centroids and re-ranks exactly within
    * those lists only. At scale the corpus is partitioned by list id — a
    * query touches nProbe/nLists of the data instead of all of it, and the
    * probe join is an equi-join on list id.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nLists: Int = 16, nProbe: Int = 4, iters: Int = 1): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("__cv"))
    val cents = trainIvfCentroids(c, nLists, iters)
    val assigned = assignToCentroids(c, cents, "list_id")
    ivfProbeAndRank(assigned, cents, queries, idCol, vecCol, k, nProbe)
  }

  /** Deterministic IVF centroid training: seeds = the nLists smallest
    * xxhash64(id); each Lloyd pass is ONE corpus aggregation
    * (literal-matrix codegen'd argmax assignment + vector-avg). Centroid
    * sets live driver-side between passes (nLists x dims doubles — metadata
    * scale) and ship as literals in the assignment expression, so no
    * lineage chains across iterations.
    */
  private def trainIvfCentroids(c: DataFrame, nLists: Int,
      iters: Int): Array[(Long, Array[Double])] = {
    def collectCents(df: DataFrame): Array[(Long, Array[Double])] =
      df.select(col("__cent").cast("long"),
        col("__centv").cast("array<double>")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    // orderBy+limit is TakeOrderedAndProject: one sorted small partition, so
    // the seed index is the row position (monotonically_increasing_id of
    // partition 0) — no global WindowExec. Seeds hash vector CONTENT (not
    // id): duplicate vectors share a hash, and the 4x oversample is deduped
    // by hash driver-side, so a duplicate-heavy corpus (the dedup use case!)
    // still gets nLists DISTINCT seed points — identical seeds could never
    // be split apart by Lloyd refinement.
    val hashed = c.select(xxhash64(col("__cv")).as("__h"),
      col("__cv").cast("array<double>").as("__centv"))
    // escalate the oversample (8x per round) until nLists DISTINCT vectors
    // appear or the take covers the corpus — a duplicate-heavy corpus (the
    // dedup use case) may have its entire small-hash prefix be copies of one
    // point. Each round is one TakeOrderedAndProject pass; typical corpora
    // finish in the first.
    var take = 4 * nLists
    var seeds = Array.empty[(Long, Array[Double])]
    var exhausted = false
    while (seeds.length < nLists && !exhausted) {
      val sample = hashed.orderBy(col("__h")).limit(take).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      seeds = sample.distinctBy(_._1).take(nLists)
      exhausted = sample.length < take
      take *= 8
    }
    var cents: Array[(Long, Array[Double])] =
      seeds.zipWithIndex.map { case ((_, v), i) => i.toLong -> v }
    // one vector-avg Aggregator per group — a single aggregate expression
    // regardless of dimensionality (dims x avg(element_at) would bloat
    // codegen at 768+), with map-side partial aggregation intact
    def refineOnce(assignedPrev: DataFrame): DataFrame =
      assignedPrev.groupBy(col("list_id"))
        .agg(graft.functions.VectorAggregates.vectorAvg(
          col("__cv").cast("array<double>")).as("__centv"))
        .select(col("list_id").as("__cent"), col("__centv"))
    var it = 0
    while (it < math.max(1, iters)) {
      cents = collectCents(refineOnce(assignToCentroids(c, cents, "list_id")))
      it += 1
    }
    cents
  }

  /** Probe the nProbe nearest centroids per query, then exact cosine re-rank
    * within the probed lists only. `assigned` carries (item_id, __cv,
    * list_id).
    */
  private def ivfProbeAndRank(assigned: DataFrame,
      cents: Array[(Long, Array[Double])], queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val refined = cents.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("__cent", "__centv")
    // probe: nProbe nearest refined centroids per query
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val probes = q.crossJoin(broadcast(refined))
      .withColumn("__sim", cosine(col("__qv"), col("__centv")))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("__sim").desc, col("__cent"))))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("__qv"), col("__cent").as("list_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("item_id"))
    assigned.join(probes, Seq("list_id"))
      .filter(col("item_id") =!= col("query_id"))
      .withColumn("cos_sim", cosine(col("__qv"), col("__cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("item_id"), round(col("cos_sim"), 5).as("cos_sim"),
        col("rnk"))
  }

  /** Persist an IVF index at `path`: the corpus assigned to `nLists`
    * inverted lists, written `partitionBy(list_id)` (one directory per
    * list), plus the trained centroids as a tiny parquet sidecar. Train
    * once, query many times — at 100 TB the payoff is that an indexed query
    * READS only its probed lists' partitions (static partition pruning, the
    * same elimination lever as the reference's partitioned tables) instead
    * of re-scanning and re-assigning the whole corpus per call.
    */
  def ivfWriteIndex(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, nLists: Int = 16, iters: Int = 1): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("__cv"))
    val cents = trainIvfCentroids(c, nLists, iters)
    assignToCentroids(c, cents, "list_id")
      .select(col("item_id"), col("__cv").as("vec"), col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$path/lists")
    cents.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Top-k over a persisted IVF index. The union of probed list ids is
    * collected driver-side (bounded by nQueries x nProbe and by nLists —
    * metadata scale, like the centroids themselves) and applied as a
    * LITERAL `isin` filter before anything else, so the scan plans STATIC
    * partition pruning: only the probed lists' directories are listed and
    * read. Output shape identical to [[ivfTopK]].
    */
  def ivfTopKIndexed(queries: DataFrame, path: String, idCol: String,
      vecCol: String, k: Int, nProbe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("list_id").cast("long"), col("centroid").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val refined = cents.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("__cent", "__centv")
    val probedIds = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .crossJoin(broadcast(refined))
      .withColumn("__sim", cosine(col("__qv"), col("__centv")))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("__sim").desc, col("__cent"))))
      .filter(col("__rn") <= nProbe)
      .select(col("__cent")).distinct()
      .collect().map(_.getLong(0))
    // literal isin directly on the partition column → partitionFilters in
    // the FileSourceScan; unprobed list dirs are never listed or read
    val assigned = spark.read.parquet(s"$path/lists")
      .filter(col("list_id").isin(probedIds: _*))
      .select(col("item_id"), col("vec").as("__cv"),
        col("list_id").cast("long").as("list_id"))
    ivfProbeAndRank(assigned, cents, queries, idCol, vecCol, k, nProbe)
  }

  /** Embedding-cosine near-duplicate pairs: hyperplane-LSH buckets generate
    * candidates (equi-join, no O(n^2)), exact cosine verifies against the
    * threshold. Lower nPlanes widens buckets (higher recall, more work).
    * `dims` is required (no driver-side row peek).
    *
    * `probeFlips = 1` extends candidate generation to pairs whose signatures
    * differ in one bit: ONE side of the self-join fans out to its nPlanes
    * Hamming-1 buckets (multi-probe); the other side stays exactly bucketed,
    * so the join input grows (nPlanes+1)x on one side only — still an
    * equi-join, never all-pairs — and a pair at signature distance <= 1 meets
    * in the unflipped side's bucket.
    */
  def embeddingNearDups(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dims: Int, nPlanes: Int = 8, seed: Long = 42L,
      probeFlips: Int = 0): DataFrame = {
    require(probeFlips >= 0 && probeFlips <= 1,
      "probeFlips: 0 (exact bucket) or 1 (probe all single-bit flips)")
    require(dims > 0, "dims must be the embedding dimensionality")
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .withColumn("__sig", lshSignature(col("__v"), nPlanes, dims, seed))
    val a0 = c.select(col("id").as("id_a"), col("__v").as("__va"), col("__sig"))
    val a =
      if (probeFlips == 0) a0.withColumn("bucket", col("__sig")).drop("__sig")
      else a0.withColumn("bucket", explode(array(
          (Seq(col("__sig")) ++
            (0 until nPlanes).map(i => col("__sig").bitwiseXOR(lit(1L << i)))): _*)))
        .drop("__sig")
    val b = c.select(col("id").as("id_b"), col("__v").as("__vb"),
      col("__sig").as("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(cosine(col("__va"), col("__vb")), 5))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
      .distinct()
  }

  /** int8-quantized cosine top-k: the corpus is scanned as 4x-smaller int8
    * codes (symmetric per-vector quantization; cosine is scale-invariant so
    * no scale column is needed) and scored with an integer multiply-
    * accumulate kernel; the top `refine*k` int8 candidates per query are
    * re-ranked with exact float cosine and the true top-k emitted. At
    * 100 TB this is the memory-bandwidth lever: the candidate scan reads a
    * quarter of the bytes, and only k*refine full-precision vectors per
    * query are ever touched.
    */
  def cosineTopKInt8(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, refine: Int = 3): DataFrame = {
    val q8 = graft.functions.VectorColumns.int8Quantize(col("__qv"))
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("__cv"),
      graft.functions.VectorColumns.int8Quantize(col(vecCol)).as("__c8"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__q8", q8)
    val wApprox = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__sim8").desc, col("item_id"))
    val cand = c.join(broadcast(q), col("item_id") =!= col("query_id"))
      .withColumn("__sim8",
        graft.functions.VectorColumns.int8Cosine(col("__c8"), col("__q8")))
      .withColumn("__rn8", row_number().over(wApprox))
      .filter(col("__rn8") <= k * refine)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("item_id"))
    cand
      .withColumn("cos_sim", cosine(col("__qv"), col("__cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("item_id"),
        round(col("cos_sim"), 5).as("cos_sim"), col("rnk"))
  }

  /** Deterministic driver-side Lloyd k-means (seeds = first k sample points
    * in the given order; empty clusters keep their centroid). The sample is
    * metadata-sized; training PQ on a sample is standard practice — the
    * corpus itself is only ever scanned once, to encode.
    */
  private def kMeansFit(pts: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    require(pts.nonEmpty, "k-means needs a non-empty sample")
    val kk = math.min(k, pts.length)
    val dim = pts(0).length
    var cents = Array.tabulate(kk)(i => pts(i).clone)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val cnts = new Array[Int](kk)
      pts.foreach { p =>
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < kk) {
          var d = 0.0; var i = 0
          while (i < dim) { val x = p(i) - cents(c)(i); d += x * x; i += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        cnts(best) += 1
        val s = sums(best); var i = 0
        while (i < dim) { s(i) += p(i); i += 1 }
      }
      cents = Array.tabulate(kk) { c =>
        if (cnts(c) == 0) cents(c)
        else { val s = sums(c); val o = new Array[Double](dim)
          var i = 0; while (i < dim) { o(i) = s(i) / cnts(c); i += 1 }; o }
      }
      it += 1
    }
    cents
  }

  /** Train product-quantization codebooks: an md5-ordered (deterministic,
    * RNG-free) sample of `sampleN` L2-normalized vectors, split into `m`
    * contiguous subspaces, k-means per subspace. Returns
    * codebooks(subspace)(code)(component).
    */
  def trainPq(corpus: DataFrame, idCol: String, vecCol: String, dims: Int,
      m: Int = 8, kCodes: Int = 256, sampleN: Int = 2000,
      iters: Int = 5): Array[Array[Array[Double]]] = {
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    val sub = dims / m
    val sample = corpus
      .select(col(idCol).as("id"),
        graft.functions.VectorColumns.l2Normalize(col(vecCol)).as("v"))
      .orderBy(substring(md5(col("id").cast("string").cast("binary")), 1, 8), col("id"))
      .limit(sampleN)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    Array.tabulate(m) { s =>
      kMeansFit(sample.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub)),
        kCodes, iters)
    }
  }

  /** Product-quantization ANN: the corpus is scanned as `m`-byte PQ codes
    * (32x smaller than 64-dim float32 at m=8) scored against a per-query
    * ADC lookup table — m array lookups + adds per candidate instead of a
    * dims-length float loop — then the top `refine*k` per query re-ranked
    * with exact cosine. Vectors are L2-normalized before encoding so ADC
    * dot IS approximate cosine. Codebooks are trained on a deterministic
    * md5-ordered sample (one driver-side k-means per subspace); the corpus
    * is scanned exactly once to encode. The 100 TB shape: codes live
    * scan-side at bytes-per-vector cost, full vectors are only touched for
    * refine*k rows per query.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dims: Int, m: Int = 8, kCodes: Int = 256,
      sampleN: Int = 2000, trainIters: Int = 5, refine: Int = 3): DataFrame = {
    val cb = trainPq(corpus, idCol, vecCol, dims, m, kCodes, sampleN, trainIters)
    val kActual = cb(0).length
    val norm = (c: Column) => graft.functions.VectorColumns.l2Normalize(c)
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("__cv"),
      graft.functions.VectorColumns.pqEncode(norm(col(vecCol)), cb).as("__code"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__lut", graft.functions.VectorColumns.pqLut(norm(col("__qv")), cb))
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("__adc").desc, col("item_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("item_id"))
    c.join(broadcast(q), col("item_id") =!= col("query_id"))
      .withColumn("__adc",
        graft.functions.VectorColumns.pqAdcDot(col("__code"), col("__lut"), kActual))
      .withColumn("__rn", row_number().over(wAdc))
      .filter(col("__rn") <= k * refine)
      .withColumn("cos_sim", cosine(col("__qv"), col("__cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("item_id"),
        round(col("cos_sim"), 5).as("cos_sim"), col("rnk"))
  }

  /** Pairwise cosine of all corpus vectors against a centroid per label —
    * embedding quality diagnostic (centroid computed with a single agg).
    */
  def labelCentroidSimilarity(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val v = col(vecCol)
    val sums = corpus.groupBy(col(labelCol))
      .agg(graft.functions.VectorAggregates.vectorAvg(
        v.cast("array<double>")).as("centroid"))
    corpus.join(broadcast(sums), labelCol)
      .withColumn("cos_to_centroid", round(cosine(v, col("centroid")), 5))
      .select(col(idCol), col(labelCol), col("cos_to_centroid"))
  }

  /** Deterministic distributed k-means clustering: IVF's trainer (seeds = k
    * smallest xxhash64(id), Lloyd passes as one aggregation each, centroids
    * driver-side between passes at metadata scale) exposed as a standalone
    * clustering operator. Returns (id, cluster_id, cos_to_centroid) — the
    * assignment is a map-side codegen'd argmax over a literal centroid
    * matrix, ZERO shuffle, so at 100 TB the clustering pass costs one corpus
    * scan per iteration plus one for the final assignment.
    */
  def kMeansClusters(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 2): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("__cv"))
    val cents = trainIvfCentroids(c, k, iters)
    val spark = corpus.sparkSession
    import spark.implicits._
    val centDf = cents.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("cluster_id", "__centv")
    assignToCentroids(c, cents, "cluster_id")
      .join(broadcast(centDf), Seq("cluster_id"))
      .select(col("item_id").as(idCol), col("cluster_id"),
        round(cosine(col("__cv"), col("__centv")), 5).as("cos_to_centroid"))
  }

  /** Semantic deduplication (SemDeDup; Abbas et al. 2023, arXiv:2303.09540):
    * k-means-cluster the embeddings, then within each cluster drop any item
    * whose cosine to a LOWER-id cluster member is ≥ `tau` (keep-the-first,
    * deterministic, single pass — no iterative grouping). The pair join is an
    * equi-join on cluster_id, so the quadratic term is bounded by the largest
    * cluster, not the corpus: at 100 TB, k is sized so clusters stay
    * partition-sized (corpus/k rows each), and nothing all-pairs ever runs.
    *
    * `maxClusterSize` makes that bound un-footgunnable: a degenerate
    * embedding set (or k too small) can dump the corpus into ONE cluster,
    * and k-means cannot split what it cannot separate (identical vectors
    * are equidistant from every centroid). Clusters above the cap are split
    * deterministically by id-hash into ceil(n/cap) sub-clusters; the pair
    * join runs within sub-clusters (≤ cap²/2 pairs each), then ONE
    * refinement pass pair-joins each split cluster's surviving
    * representatives (guarded by the same cap), so the all-identical case
    * still converges to a single kept row. Within-cap clusters are
    * untouched — the exact SemDeDup answer. Recall loss exists only for a
    * cluster whose pairwise-distinct survivor count exceeds the cap, where
    * exactness would be quadratic by definition.
    *
    * Returns every corpus row flagged: (id, cluster_id, is_dup, dup_of —
    * the lowest-id witness the row is tau-similar to, NULL for kept rows).
    * The witness may itself be flagged (a~b, b~c, a!~c drops both b
    * and c with witnesses a and b): chase the chain if a canonical kept
    * representative is needed — the keep/drop decision itself needs no
    * chasing.
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double, iters: Int = 2,
      maxClusterSize: Int = 10000): DataFrame = {
    require(maxClusterSize == 0 || maxClusterSize > 1,
      s"maxClusterSize must be 0 (unguarded) or > 1: $maxClusterSize")
    // cluster assignment is the SAME map-side codegen'd argmax
    // kMeansClusters runs (identical centroids, identical labels) inlined
    // over the corpus directly: the r16 shape routed it through
    // kMeansClusters' output and re-joined the corpus to itself by id to
    // recover the vector column — a full corpus-by-id shuffle join (2
    // exchanges) executed on EVERY consumption of `assigned` (the size
    // gate, both pair-join sides, the final flag join). Now `assigned` is
    // a pure projection: zero shuffle, recomputes at scan speed.
    val cv = corpus.select(col(idCol).as("__id"), col(vecCol).as("__cv"))
    val cents = trainIvfCentroids(cv, k, iters)
    val assigned = assignToCentroids(cv, cents, "cluster_id")
      .select(col("__id"), col("cluster_id"), col("__cv").as("__v"))
    // cluster sizes are k rows (metadata-bounded, like the centroids the
    // trainer already holds): the NORMAL case — every cluster within cap —
    // runs the exact uncapped plan, paying only this size-check scan (one
    // assignment aggregation, ~one Lloyd iteration); the rescue path below
    // engages only on degeneracy. maxClusterSize = 0 skips the gate for a
    // TRUSTED corpus — zero overhead, and unbounded quadratic risk back on
    // the caller.
    val oversized = maxClusterSize > 0 && assigned.groupBy("cluster_id")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxClusterSize).count() > 0
    def pairDups(df: DataFrame, keys: Seq[String]): DataFrame = {
      val left = df.select((keys.map(col) :+ col("__id").as("__i")
        :+ col("__v").as("__vi")): _*)
      val right = df.select((keys.map(col) :+ col("__id").as("__j")
        :+ col("__v").as("__vj")): _*)
      left.join(right, keys)
        .filter(col("__i") < col("__j"))
        .filter(cosine(col("__vi"), col("__vj")) >= tau)
        .groupBy(col("__j").as("__id"))
        .agg(min(col("__i")).as("dup_of"))
    }
    val dups =
      if (!oversized) pairDups(assigned, Seq("cluster_id"))
      else {
        // rescue path: split over-cap clusters into ceil(n/cap) hash
        // sub-clusters. The frame self-joins several times below, so pin
        // it once (localCheckpoint) instead of recomputing k-means per
        // reference — bounded at corpus width, the SemDeDup working set.
        val sizes = assigned.groupBy("cluster_id").agg(count(lit(1)).as("__n"))
        val salted = assigned.join(broadcast(sizes), Seq("cluster_id"))
          .withColumn("__splits",
            greatest(lit(1L), ceil(col("__n") / lit(maxClusterSize))).cast("int"))
          .withColumn("__sub",
            pmod(xxhash64(col("__id")), col("__splits")).cast("int"))
          .localCheckpoint()
        val within = pairDups(salted, Seq("cluster_id", "__sub"))
        // refinement: each SPLIT cluster's sub-cluster survivors pair-join
        // once within the original cluster (bounded by the same cap) —
        // catches the cross-sub-cluster duplicates the salt hid; e.g.
        // all-identical vectors leave one survivor per sub-cluster, and
        // this pass keeps exactly one
        val splitRows = salted.filter(col("__splits") > lit(1))
        val survivors = splitRows.join(within, Seq("__id"), "left_anti")
        val survSizes = survivors.groupBy("cluster_id")
          .agg(count(lit(1)).as("__sn"))
        val refinable = survivors.join(
          broadcast(survSizes.filter(col("__sn") <= maxClusterSize)),
          Seq("cluster_id"))
        val refined = pairDups(refinable, Seq("cluster_id"))
        within.union(refined)
          .groupBy("__id").agg(min(col("dup_of")).as("dup_of"))
      }
    assigned.join(dups, Seq("__id"), "left_outer")
      .select(col("__id").as(idCol), col("cluster_id"),
        col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
  }
}
