package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>).
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the (small) query
  * set against the corpus, all arithmetic in codegen'd higher-order functions,
  * followed by a per-query top-k window. At 100 TB the corpus side stays
  * partition-parallel with no shuffle until the final per-query top-k (which
  * reduces to k rows per query per partition via TakeOrdered semantics).
  *
  * Scale path: random-hyperplane LSH bucketing — deterministic hyperplanes
  * derived from a seed, signature computed map-side, candidates restricted to
  * same-bucket rows (equi-join on bucket id), then exact cosine re-rank.
  */
object Similarity {

  /** Dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding self-matches by id). Query side must be small enough
    * to broadcast.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), asDouble(col(vecCol)).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv"))
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

  /** Deterministic pseudo-random hyperplane component in [-1, 1), derived from
    * (seed, plane, dim) via xxhash64 — reproducible across runs and engines.
    */
  private def planeComponent(plane: Int, dim: Column, seed: Long): Column =
    (xxhash64(concat_ws(":", lit(seed), lit(plane), dim)).cast("double")
      / lit(Long.MaxValue.toDouble))

  /** Random-hyperplane LSH signature: `nPlanes` sign bits packed in a long. */
  def lshSignature(vec: Column, nPlanes: Int, seed: Long): Column = {
    val v = asDouble(vec)
    (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * planeComponent(p, i, seed)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN via LSH buckets: candidates share the exact signature bucket; exact
    * cosine re-rank inside the bucket. Trades recall for a shuffle keyed on
    * the bucket id instead of a full cross join.
    */
  def annLsh(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nPlanes: Int = 12, seed: Long = 42L): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), asDouble(col(vecCol)).as("__cv"))
      .withColumn("bucket", lshSignature(col("__cv"), nPlanes, seed))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv"))
      .withColumn("bucket", lshSignature(col("__qv"), nPlanes, seed))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("item_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("item_id") =!= col("query_id"))
      .withColumn("cos_sim", cosine(col("__qv"), col("__cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("item_id"), round(col("cos_sim"), 5).as("cos_sim"),
        col("rnk"))
  }

  /** Pairwise cosine of all corpus vectors against a centroid per label —
    * embedding quality diagnostic (centroid computed with a single agg).
    */
  def labelCentroidSimilarity(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val dims = corpus.select(size(col(vecCol)).as("d")).head().getInt(0)
    val v = asDouble(col(vecCol))
    val sums = corpus.groupBy(col(labelCol))
      .agg(array((0 until dims).map(i => avg(element_at(v, i + 1))): _*).as("centroid"))
    corpus.join(broadcast(sums), labelCol)
      .withColumn("cos_to_centroid", round(cosine(v, col("centroid")), 5))
      .select(col(idCol), col(labelCol), col("cos_to_centroid"))
  }
}
