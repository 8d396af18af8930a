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
    * `dims` is the embedding dimensionality (pass it; the default -1 reads
    * one row to detect it). `probeFlips = 1` enables multi-probe: each query
    * additionally probes every bucket at Hamming distance 1 from its own
    * (the nPlanes single-bit flips) — the classic multi-probe LSH recall
    * recovery (Lv et al., VLDB'07) at the cost of nPlanes+1 probe keys per
    * query instead of wider buckets. Only the (small, broadcast) query side
    * fans out; the corpus is still bucketed once.
    */
  def annLsh(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nPlanes: Int = 12, seed: Long = 42L, dims: Int = -1,
      probeFlips: Int = 0): DataFrame = {
    require(probeFlips >= 0 && probeFlips <= 1,
      "probeFlips: 0 (exact bucket) or 1 (probe all single-bit flips)")
    val d = if (dims > 0) dims else corpus.select(size(col(vecCol))).head().getInt(0)
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
    // deterministic seeds: the nLists smallest xxhash64(id)
    val seeds = c.withColumn("__h", xxhash64(col("item_id")))
      .orderBy(col("__h")).limit(nLists)
      .withColumn("seed_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("__h"))) - 1)
      .select(col("seed_id"), col("__cv").as("__seed"))
    // assign every vector to its nearest centroid, refine `iters` times
    // (Lloyd steps; each is one broadcast cross-score + one groupBy — at
    // scale, centroids stay tiny and every pass is a map-side scan)
    def nearest(vecs: DataFrame, cents: DataFrame, centVec: String,
        out: String): DataFrame = {
      vecs.crossJoin(broadcast(cents))
        .withColumn("__sim", cosine(col("__cv"), col("__centv")))
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("item_id"))
            .orderBy(col("__sim").desc, col(centVec))))
        .filter(col("__rn") === 1)
        .select(vecs.columns.map(col) :+ col(centVec).as(out): _*)
    }
    // one vector-avg Aggregator per group — a single aggregate expression
    // regardless of dimensionality (dims x avg(element_at) would bloat
    // codegen at 768+), with map-side partial aggregation intact
    def refineOnce(assignedPrev: DataFrame): DataFrame =
      assignedPrev.groupBy(col("list_id"))
        .agg(graft.functions.VectorAggregates.vectorAvg(
          col("__cv").cast("array<double>")).as("__centv"))
        .select(col("list_id").as("__cent"), col("__centv"))
    var assigned = nearest(c, seeds.select(col("seed_id").as("__cent"),
      col("__seed").as("__centv")), "__cent", "list_id")
    var refined = refineOnce(assigned)
    var it = 1
    while (it < math.max(1, iters)) {
      assigned = nearest(c, refined, "__cent", "list_id")
      refined = refineOnce(assigned)
      it += 1
    }
    assigned = nearest(c, refined, "__cent", "list_id")
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

  /** Embedding-cosine near-duplicate pairs: hyperplane-LSH buckets generate
    * candidates (equi-join, no O(n^2)), exact cosine verifies against the
    * threshold. Lower nPlanes widens buckets (higher recall, more work).
    */
  def embeddingNearDups(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nPlanes: Int = 8, seed: Long = 42L,
      dims: Int = -1): DataFrame = {
    val d = if (dims > 0) dims else corpus.select(size(col(vecCol))).head().getInt(0)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .withColumn("bucket", lshSignature(col("__v"), nPlanes, d, seed))
    val a = c.select(col("id").as("id_a"), col("__v").as("__va"), col("bucket"))
    val b = c.select(col("id").as("id_b"), col("__v").as("__vb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(cosine(col("__va"), col("__vb")), 5))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
      .distinct()
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
}
