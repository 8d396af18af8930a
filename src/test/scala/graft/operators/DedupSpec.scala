package graft.operators

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = Engine.table(spark, sfDir, "documents")

  /** documents ∪ (exact copies of docs 0-4 with shifted ids) — a corpus with
    * known duplicate pairs, derived from the shared testdata.
    */
  private lazy val withExactDups = {
    import spark.implicits._
    val copies = docs.filter($"doc_id" < 5)
      .withColumn("doc_id", $"doc_id" + 100000)
    docs.unionByName(copies)
  }

  /** Near-duplicates: docs 0-4 with the first word dropped (high word-set
    * overlap, not byte-identical).
    */
  private lazy val withNearDups = {
    import spark.implicits._
    val perturbed = docs.filter($"doc_id" < 5)
      .withColumn("doc_id", $"doc_id" + 100000)
      .withColumn("text", expr("concat_ws(' ', slice(split(text, ' '), 2, 100000))"))
    docs.unionByName(perturbed)
  }

  test("exact dedup removes byte-identical duplicates, keeps min id") {
    import spark.implicits._
    val deduped = Dedup.exact(withExactDups, "doc_id", "text")
    assert(deduped.count() === docs.count())
    // originals (min ids) survive
    assert(deduped.filter($"doc_id" >= 100000).count() === 0)
  }

  test("exact dedup keeps the surviving row's own metadata") {
    import spark.implicits._
    // copies share text but carry a marker source — must never leak through
    val copies = docs.filter($"doc_id" < 5)
      .withColumn("doc_id", $"doc_id" + 100000)
      .withColumn("source", lit("COPY_MARKER"))
    val deduped = Dedup.exact(docs.unionByName(copies), "doc_id", "text")
    assert(deduped.filter($"source" === "COPY_MARKER").count() === 0)
  }

  test("exactGroups reports duplicate group sizes") {
    import spark.implicits._
    val groups = Dedup.exactGroups(withExactDups, "doc_id", "text")
    assert(groups.filter($"group_size" === 2).count() === 5)
    assert(groups.filter($"group_size" === 2).agg(max($"keep_id")).head().getLong(0) < 5)
  }

  test("minhash LSH finds near-duplicate pairs with high estimated jaccard") {
    import spark.implicits._
    val cands = Dedup.minhashCandidates(withNearDups, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16)
    val pairs = cands.filter($"id_b" === $"id_a" + 100000)
    // all 5 planted near-dup pairs surface as candidates with high est sim
    // (the corpus also contains organic near-dups — those may appear too)
    assert(pairs.count() === 5)
    assert(pairs.agg(min($"est_jaccard")).head().getDouble(0) > 0.9)
  }

  test("nearDuplicates verifies candidates with exact jaccard") {
    import spark.implicits._
    val nd = Dedup.nearDuplicates(withNearDups, "doc_id", "text", threshold = 0.6)
    val planted = nd.filter($"id_b" === $"id_a" + 100000)
    assert(planted.count() === 5)
    assert(planted.agg(min($"jaccard")).head().getDouble(0) >= 0.6)
  }

  test("simhash of near-identical docs has small hamming distance") {
    import spark.implicits._
    val sh = Dedup.withSimhash(withNearDups).select($"doc_id", $"simhash")
    val a = sh.filter($"doc_id" < 5).withColumnRenamed("simhash", "sa")
      .withColumnRenamed("doc_id", "ida")
    val b = sh.filter($"doc_id" >= 100000).withColumnRenamed("simhash", "sb")
      .withColumnRenamed("doc_id", "idb")
    val joined = a.join(b, a("ida") + 100000 === b("idb"))
      .select(Dedup.hammingDistance($"sa", $"sb").cast("long").as("hd"))
    assert(joined.agg(max($"hd")).head().getLong(0) <= 12)
    // distinct docs sit farther apart on average than the planted near-dups
    val cross = a.crossJoin(b)
      .filter($"ida" + 100000 =!= $"idb")
      .select(Dedup.hammingDistance($"sa", $"sb").cast("long").as("hd"))
    val crossAvg = cross.agg(avg($"hd")).head().getDouble(0)
    val pairAvg = joined.agg(avg($"hd")).head().getDouble(0)
    assert(crossAvg > pairAvg)
  }

  test("dropNearDuplicates removes exact and near dups, keeps originals") {
    import spark.implicits._
    val cleaned = Dedup.dropNearDuplicates(withNearDups, "doc_id", "text",
      threshold = 0.8)
    // all 5 perturbed copies are gone; their originals survive
    assert(cleaned.filter($"doc_id" >= 100000).count() === 0)
    assert(cleaned.filter($"doc_id" < 5).count() === 5)
    // organic near-dups in the corpus may also be removed, never added
    assert(cleaned.count() <= docs.count())
  }

  test("dropNearDuplicatesKeepBest keeps the higher-scored copy") {
    import spark.implicits._
    // planted copies (id >= 100000) get a HIGHER score than their originals:
    // keep-best must retain the copy and drop the original — the opposite of
    // keep-first
    val scored = withNearDups.withColumn("score",
      when($"doc_id" >= 100000, 10.0).otherwise(1.0))
    val cleaned = Dedup.dropNearDuplicatesKeepBest(scored, "doc_id", "score",
      "text", threshold = 0.8)
    val keptCopies = cleaned.filter($"doc_id" >= 100000).count()
    val droppedOriginals = 5 - cleaned.filter($"doc_id" < 5).count()
    assert(keptCopies === 5)
    assert(droppedOriginals === 5)
    assert(cleaned.count() <= scored.count())
  }

  test("keep-best: exact duplicates keep the best-scored copy; NULL scores lose") {
    import spark.implicits._
    val rows = Seq(
      (1L, "the same exact text content here", Some(1.0)),   // exact-dup, low
      (2L, "the same exact text content here", Some(9.0)),   // exact-dup, high -> survives
      (3L, "a completely different document body", None),    // near-pairless, null score survives alone
      (4L, "unique scored document text body words", Some(2.0)))
      .toDF("doc_id", "text", "score")
    val cleaned = Dedup.dropNearDuplicatesKeepBest(rows, "doc_id", "score",
      "text", threshold = 0.9)
    val ids = cleaned.select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids.contains(2L) && !ids.contains(1L),
      s"exact-dup survivor must be the higher-scored copy, got $ids")
    assert(ids.contains(3L) && ids.contains(4L))
  }

  test("connectedComponents labels chains and separate clusters") {
    import spark.implicits._
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  /** A 3-doc chain of sliding 30-word windows (stride 6): adjacent windows
    * share 22/34 shingles (jaccard .647), the chain ends only 16/40 (.4) —
    * so with threshold 0.6 the verified pairs are exactly (1,2) and (2,3).
    */
  private def chainDocs = {
    import spark.implicits._
    val words = (0 until 42).map(i => s"tok$i")
    def win(start: Int) = words.slice(start, start + 30).mkString(" ")
    (Seq((1L, win(0)), (2L, win(6)), (3L, win(12))) :+
      (50L, (100 until 130).map(i => s"zz$i").mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("near-dup chain a~b~c collapses to one survivor (keep-first)") {
    import spark.implicits._
    // pair (1,3) is below threshold: only the component walk links them
    val pairs = Dedup.nearDuplicates(chainDocs, "doc_id", threshold = 0.6,
      numHashes = 64, bands = 32)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (2L, 3L)))
    val cleaned = Dedup.dropNearDuplicates(chainDocs, "doc_id", threshold = 0.6,
      numHashes = 64, bands = 32)
    assert(cleaned.select($"doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 50L))
  }

  test("near-dup chain keeps exactly the best-scored member (keep-best)") {
    import spark.implicits._
    val scored = chainDocs.withColumn("score",
      when($"doc_id" === 2L, 0.9).when($"doc_id" === 3L, 0.5).otherwise(0.1))
    val cleaned = Dedup.dropNearDuplicatesKeepBest(scored, "doc_id", "score",
      threshold = 0.6, numHashes = 64, bands = 32)
    assert(cleaned.select($"doc_id").as[Long].collect().sorted.toSeq === Seq(2L, 50L))
  }

  test("dedup releases its internal checkpoint blocks (storage returns to baseline)") {
    import spark.implicits._
    def persisted = spark.sparkContext.getPersistentRDDs.size
    val before = persisted
    val cleaned = Dedup.dropNearDuplicates(withNearDups, "doc_id", "text",
      threshold = 0.8)
    assert(cleaned.count() > 0)
    // signatures, the exact-clean corpus, the CC edge set, and every CC
    // sweep must be released by the operator itself; the only block set the
    // call may leave behind is the loser-id checkpoint (tiny) that the
    // returned frame anti-joins against
    val retained = persisted - before
    assert(retained <= 1,
      s"dropNearDuplicates retained $retained persisted RDD(s), expected <= 1")
    val keepBest = Dedup.dropNearDuplicatesKeepBest(
      withNearDups.withColumn("score", lit(1.0)), "doc_id", "score", "text",
      threshold = 0.8)
    assert(keepBest.count() > 0)
    val retained2 = persisted - before
    assert(retained2 <= 2,
      s"keep-best retained ${retained2 - retained} more persisted RDD(s), expected <= 1")
  }

  test("jaccard is exact on known sets") {
    import spark.implicits._
    val df = Seq(("a b c d", "a b c e")).toDF("t1", "t2")
    val j = df.select(Dedup.jaccard(split($"t1", " "), split($"t2", " "), 1).as("j"))
      .head().getDouble(0)
    // shingle k=1: sets {a,b,c,d} vs {a,b,c,e}: 3 / 5
    assert(j === 0.6)
  }
}
