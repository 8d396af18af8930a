package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large corpora: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard.
  *
  * Scale design (100 TB): signatures are computed map-side as pure Catalyst
  * expressions (codegen'd, no UDFs); the only shuffles are (a) the hash
  * group-by for exact dedup and (b) the LSH band-bucket self-join, which is an
  * equi-join on (band_idx, band_hash) — both partition cleanly by key and
  * avoid any O(n^2) comparison. Candidate verification touches only
  * same-bucket pairs.
  */
object Dedup {

  /** Exact dedup on a content hash: keeps the row with the minimum id per
    * distinct content. One hash-partitioned aggregation — the canonical
    * groupBy-dedup.
    */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    // keep the min-id ROW per content hash (not min id + arbitrary metadata):
    // rank within hash by id and keep rank 1, so every output column comes
    // from the same surviving row — deterministic regardless of duplicates'
    // other columns.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h")).orderBy(col(idCol))
    df.withColumn("__h", md5(col(contentCol).cast("binary")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__h", "__rn")
  }

  /** Exact-duplicate group stats: content hash -> group size, kept id. */
  def exactGroups(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol).cast("binary")).as("content_hash"))
      .agg(count(lit(1)).as("group_size"), min(col(idCol)).as("keep_id"))

  /** MinHash signature: for shingle set S, sig[i] = unsigned-min_{s in S}
    * of the i-th odd-multiplier 64-bit permutation of xxhash64(s).
    * Implemented as a custom Catalyst
    * expression with a primitive inner loop (graft.functions.MinHashSignature)
    * — Spark's interpreted higher-order functions are ~1000x slower for the
    * O(shingles x hashes) work. Map-side, shuffle-free.
    */
  def minhashSignature(words: Column, shingleSize: Int, numHashes: Int): Column =
    graft.functions.TextHashColumns.minhashSignature(words, shingleSize, numHashes)

  /** Adds a `minhash` signature column (array<bigint> of length numHashes). */
  def withMinhash(df: DataFrame, textCol: String = "text",
      shingleSize: Int = 3, numHashes: Int = 64): DataFrame =
    df.withColumn("minhash",
      minhashSignature(TextAnalysis.tokens(col(textCol)), shingleSize, numHashes))

  /** LSH banding: explode the signature into (band_idx, band_hash) keys.
    * Docs sharing any band key are near-dup candidates.
    */
  def lshBands(df: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    df.select(df.columns.map(col) :+
      posexplode(graft.functions.VectorColumns.lshBandHashes(col("minhash"), bands))
        .as(Seq("band_idx", "band_hash")): _*)

  /** Near-duplicate candidate pairs via MinHash LSH.
    * Returns (id_a, id_b, est_jaccard) for pairs sharing >= 1 band bucket,
    * with est_jaccard = fraction of matching signature components.
    * Scale design: the self-join is equi on (band_idx, band_hash) and the
    * agreement fraction is computed BEFORE dedup, so the pair shuffle carries
    * (id_a, id_b, est) — never the signatures. Bucket skew is bounded because
    * identical texts collapse to identical signatures (run exact dedup first
    * for pathological corpora).
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String = "text",
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame =
    minhashCandidatesReleasable(df, idCol, textCol, shingleSize, numHashes, bands)._1

  /** [[minhashCandidates]] plus a release hook that frees the internal
    * signature checkpoint's storage blocks. Call the hook once the returned
    * frame has been fully materialized (and will never be scanned again) —
    * the composed dedup operators do; ad-hoc callers can use the plain
    * variant and accept signature-table retention until GC.
    */
  private[graft] def minhashCandidatesReleasable(df: DataFrame, idCol: String,
      textCol: String = "text", shingleSize: Int = 3, numHashes: Int = 64,
      bands: Int = 16): (DataFrame, () => Unit) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // both sides of the band self-join consume the signatures — checkpoint
    // them so the O(shingles x hashes) signature pass runs once, not twice
    // (the signature table is (id, numHashes longs), a sliver of the corpus)
    val sig = withMinhash(df.select(col(idCol), col(textCol)), textCol, shingleSize, numHashes)
      .select(col(idCol), col("minhash"))
      .localCheckpoint()
    val banded = lshBands(sig, bands, r)
    val a = banded.select(col(idCol).as("id_a"), col("minhash").as("sig_a"),
      col("band_idx"), col("band_hash"))
    val b = banded.select(col(idCol).as("id_b"), col("minhash").as("sig_b"),
      col("band_idx"), col("band_hash"))
    val cands = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(graft.functions.VectorColumns.sigMatchFraction(col("sig_a"), col("sig_b")), 4)
          .as("est_jaccard"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("est_jaccard")).as("est_jaccard"))
    (cands, () => graft.Engine.releaseCheckpoint(sig))
  }

  /** Connected components over an undirected edge list, by iterative
    * min-label propagation: every node's label becomes the minimum of its
    * own and its neighbors', repeated until fixpoint (or `maxIters`). Each
    * sweep is one equi-join + min-aggregate, both shuffling on the node id —
    * no driver-side graph, O(diameter) sweeps (near-dup clusters are
    * shallow). Lineage is truncated per sweep with localCheckpoint so the
    * plan doesn't grow with iterations (at cluster scale, point
    * `spark.sparkContext.setCheckpointDir` at durable storage and swap in
    * `checkpoint` for strict fault tolerance).
    *
    * Returns (id, component) for every node appearing in an edge; at
    * fixpoint the component label is the minimum id of the component.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 20): DataFrame = {
    // the edge list is consumed by EVERY sweep — checkpoint it once, or each
    // sweep re-executes the whole upstream candidate pipeline (for near-dup
    // edges: minhash + band join + jaccard verify) through its lineage. The
    // edge set is small (verified duplicate pairs), so this is cheap.
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .localCheckpoint()
    // no edges — no components: skip label seeding and the sweep loop
    // outright (a clean corpus reaches here on EVERY near-dup pass; the
    // empty case otherwise still paid the seed checkpoint plus two
    // confirm sweeps' worth of jobs). The isEmpty probe reads the
    // just-materialized checkpoint, not the candidate pipeline.
    if (sym.isEmpty) {
      val spark = edges.sparkSession
      val t = sym.schema("src").dataType
      graft.Engine.releaseCheckpoint(sym)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", t),
          org.apache.spark.sql.types.StructField("component", t))))
    }
    // seed fused with sweep 1: from identity labels, the first sweep's
    // result is per-node min(self, neighbors) — ONE aggregation over the
    // symmetric edges (every node appears as dst), no distinct-ids seed
    // job and no join (r17; the loop below starts from sweep 2)
    var labels = sym.groupBy(col("dst"))
      .agg(min(col("src")).as("_m"))
      .select(col("dst").as("id"),
        least(col("dst"), col("_m")).as("component"))
      .localCheckpoint()
    var changed = 1L
    var it = 1
    while (changed > 0 && it < maxIters) {
      val nbrMin = sym.join(labels, sym("src") === labels("id"))
        .groupBy(col("dst")).agg(min(col("component")).as("_nbr_min"))
      // the convergence signal piggybacks on the checkpoint's own job as an
      // observed metric — no extra probe job per sweep
      val obs = org.apache.spark.sql.Observation(
        s"graft_cc_${ccObsId.incrementAndGet()}")
      val prev = labels
      val stepped = labels.join(nbrMin, labels("id") === nbrMin("dst"), "left")
        .select(labels("id"),
          least(labels("component"), coalesce(col("_nbr_min"), labels("component")))
            .as("component"),
          (col("_nbr_min") < labels("component")).as("_chg"))
        .observe(obs, sum(when(col("_chg"), 1L).otherwise(0L)).as("changed"))
        .localCheckpoint()
      labels = stepped.drop("_chg")
      changed = observedLong(obs, "changed")
        // metric delivery rides the async listener bus; on (never observed)
        // timeout fall back to a limit-1 probe rather than hang or miscount
        .getOrElse(if (stepped.filter(col("_chg")).isEmpty) 0L else 1L)
      // the superseded sweep's blocks are dead the moment the new checkpoint
      // exists — release them, or MEMORY_AND_DISK usage grows per sweep for
      // the life of the session
      graft.Engine.releaseCheckpoint(prev)
      it += 1
    }
    graft.Engine.releaseCheckpoint(sym)
    if (changed > 0)
      // non-convergence means clusters deeper than maxIters sweeps keep >1
      // survivor (silent under-dedup) — make it detectable
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents: NOT converged after $it sweeps ($changed labels " +
          s"still changing) — raise maxIters (chains deeper than $maxIters " +
          "leave multiple survivors per cluster)")
    labels
  }

  private val ccObsId = new java.util.concurrent.atomic.AtomicLong()

  /** Bounded wait for an Observation's metric row (the action has already
    * completed synchronously; only listener-bus delivery is async). None on
    * timeout so callers can fall back instead of blocking forever —
    * `Observation.get` alone would hang if the bus ever dropped the event.
    */
  private def observedLong(obs: org.apache.spark.sql.Observation,
      key: String): Option[Long] =
    try {
      val m = scala.concurrent.Await.result(
        scala.concurrent.Future(obs.get)(scala.concurrent.ExecutionContext.global),
        scala.concurrent.duration.Duration(30, "s"))
      Some(m.get(key) match { case Some(n: Long) => n; case _ => 0L })
    } catch { case _: java.util.concurrent.TimeoutException => None }

  /** End-to-end near-dup removal: exact dedup, then resolve LSH-verified
    * near-duplicate pairs into connected components and keep the minimum id
    * of each component (the canonical keep-first corpus cleaning pass) —
    * a~b~c chains collapse to exactly one survivor even when a and c are
    * not directly similar. Output is the cleaned DataFrame.
    *
    * Storage discipline: every internal checkpoint (signatures, ranked
    * corpus, CC sweeps) is released before returning; the only blocks that
    * outlive the call are the loser-id set (tiny). The returned frame is
    * `df` anti-joined against the UNION of exact-duplicate loser ids and
    * near-dup-cluster loser ids — identical rows to filtering the exact
    * survivors, but consuming it costs ONE corpus scan + an id anti-join
    * (broadcastable): the content-hash window (a full-corpus shuffle+sort)
    * runs once while the loser set builds, never again at consumption. The
    * r16 shape re-ran that window inside the returned plan — at 100 TB a
    * second full exchange+sort of the corpus for information already held
    * in the loser-id set (the guide-§8 rule: decide on small rows once,
    * then move the heavy rows exactly once).
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String = "text",
      threshold: Double = 0.8, shingleSize: Int = 3,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    // one content-hash window pass ranks every row; winners feed candidate
    // generation (consumed twice: signatures + jaccard texts — hence the
    // checkpoint), losers contribute their ids to the final anti-join set
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h")).orderBy(col(idCol))
    val ranked = df.withColumn("__h", md5(col(textCol).cast("binary")))
      .withColumn("__rn", row_number().over(w))
      .drop("__h")
      .localCheckpoint()
    val exactClean = ranked.filter(col("__rn") === 1).drop("__rn")
    val exactLosers = ranked.filter(col("__rn") =!= 1).select(col(idCol))
    val (pairs, releaseSig) = nearDuplicatesReleasable(exactClean, idCol,
      textCol, threshold, shingleSize, numHashes, bands)
    // at fixpoint the component label IS the min id: losers are the rest.
    // connectedComponents materializes `pairs` (its first action), after
    // which the signature checkpoint is dead.
    val comp = connectedComponents(pairs, "id_a", "id_b")
    releaseSig()
    val losers = exactLosers
      .union(comp.filter(col("id") =!= col("component")).select(col("id").as(idCol)))
      .localCheckpoint()
    graft.Engine.releaseCheckpoint(comp)
    graft.Engine.releaseCheckpoint(ranked)
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Keep-best near-dup cleaning: like [[dropNearDuplicates]] but the
    * survivor — of exact-duplicate groups AND of each near-dup cluster —
    * is chosen by `scoreCol` (higher wins; NULL ranks last; ties break to
    * the smaller id) instead of keep-first — the shape a quality-filtered
    * training corpus wants (drop the worse copy, not the later one).
    * Clusters are connected components of the verified candidate pairs, so
    * a chain keeps exactly its single best-scored member.
    */
  def dropNearDuplicatesKeepBest(df: DataFrame, idCol: String, scoreCol: String,
      textCol: String = "text", threshold: Double = 0.8, shingleSize: Int = 3,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    // ONE content-hash window pass ranks every row by score (the window
    // keys on the content HASH, not the full text — shuffling/sorting on
    // multi-KB document keys wastes the wire): rank-1 rows are the
    // exact-dedup survivors that feed candidate generation, the rest
    // contribute their ids to the final anti-join set. The returned frame
    // is `df` anti-joined on (exact losers ∪ cluster losers) — row-identical
    // to filtering the survivors, but consumption costs one corpus scan +
    // an id anti-join instead of re-running the full-corpus window
    // shuffle+sort a second time (guide §8: the keep/drop decision already
    // lives in the small loser-id set).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol).cast("binary")))
      .orderBy(scoreRank(col(scoreCol)).desc, col(idCol).asc)
    // consumed by pair generation (2x) and the score join — checkpoint so
    // the corpus scan + dedup window run once while the loser set builds
    val ranked = df
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
      .localCheckpoint()
    val exactClean = ranked.filter(col("_rn") === 1).drop("_rn")
    val exactLosers = ranked.filter(col("_rn") =!= 1).select(col(idCol))
    val (pairs, releaseSig) = nearDuplicatesReleasable(exactClean, idCol,
      textCol, threshold, shingleSize, numHashes, bands)
    val labels = connectedComponents(pairs, "id_a", "id_b")
    releaseSig()
    val comp = labels
      .join(exactClean.select(col(idCol).as("id"), col(scoreCol).as("_score")), "id")
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component")).orderBy(scoreRank(col("_score")).desc, col("id").asc)
    val losers = exactLosers
      .union(comp
        .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(cw))
        .filter(col("_rn") =!= 1)
        .select(col("id").as(idCol)))
      .localCheckpoint()
    graft.Engine.releaseCheckpoint(labels)
    graft.Engine.releaseCheckpoint(ranked)
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** NULL scores rank below every real score (and below each other, where
    * the id tie-break decides) — otherwise a NULL comparison would invert
    * survivor selection.
    */
  private def scoreRank(c: Column): Column =
    coalesce(c.cast("double"), lit(Double.NegativeInfinity))

  /** SimHash (64-bit) of the token stream: per-bit majority vote of token
    * hashes. Pure expressions: one transform per doc + 64-lane vote done with
    * an aggregate over bit positions.
    */
  def simhash(words: Column): Column =
    graft.functions.TextHashColumns.simhash64(words)

  def withSimhash(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("simhash", simhash(TextAnalysis.tokens(col(textCol))))

  /** Hamming distance between two 64-bit simhashes. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Exact n-gram Jaccard similarity between two word arrays. */
  def jaccard(wordsA: Column, wordsB: Column, k: Int): Column = {
    val sa = array_distinct(TextAnalysis.shingles(wordsA, k))
    val sb = array_distinct(TextAnalysis.shingles(wordsB, k))
    round(size(array_intersect(sa, sb)).cast("double") /
      greatest(size(array_union(sa, sb)), lit(1)), 4)
  }

  /** Verified near-dup pairs: LSH candidates filtered by exact Jaccard. */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String = "text",
      threshold: Double = 0.7, shingleSize: Int = 3,
      numHashes: Int = 64, bands: Int = 16): DataFrame =
    nearDuplicatesReleasable(df, idCol, textCol, threshold, shingleSize,
      numHashes, bands)._1

  /** [[nearDuplicates]] plus the signature-checkpoint release hook (see
    * [[minhashCandidatesReleasable]]).
    */
  private[graft] def nearDuplicatesReleasable(df: DataFrame, idCol: String,
      textCol: String = "text", threshold: Double = 0.7, shingleSize: Int = 3,
      numHashes: Int = 64, bands: Int = 16): (DataFrame, () => Unit) = {
    val (cands, release) =
      minhashCandidatesReleasable(df, idCol, textCol, shingleSize, numHashes, bands)
    val texts = df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__w"))
    val verified = cands
      .join(texts.select(col(idCol).as("id_a"), col("__w").as("__wa")), "id_a")
      .join(texts.select(col(idCol).as("id_b"), col("__w").as("__wb")), "id_b")
      .withColumn("jaccard", jaccard(col("__wa"), col("__wb"), shingleSize))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"), col("jaccard"))
    (verified, release)
  }
}
