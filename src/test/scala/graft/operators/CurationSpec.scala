package graft.operators

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private lazy val docs = Engine.table(spark, sfDir, "documents")
    .select(col("doc_id"), col("lang"), col("source"))

  test("quotaSample takes exactly quota per stratum, deterministically") {
    val s1 = Curation.quotaSample(docs, "lang", "doc_id", 10)
    val s2 = Curation.quotaSample(docs, "lang", "doc_id", 10)
    val counts = s1.groupBy(col("lang")).count().collect()
    assert(counts.length === 5)
    counts.foreach(r => assert(r.getLong(1) === 10L))
    // pure function of ids: two runs pick the identical membership
    assert(s1.select("doc_id").exceptAll(s2.select("doc_id")).isEmpty)
    // growing the quota extends the sample, never reshuffles it (nested
    // samples — the property that lets a pipeline cheaply resize)
    val s3 = Curation.quotaSample(docs, "lang", "doc_id", 20)
    assert(s1.select("doc_id").exceptAll(s3.select("doc_id")).isEmpty)
  }

  test("quotaSample plans a WindowGroupLimit (partial top-q before the shuffle)") {
    val plan = Curation.quotaSample(docs, "lang", "doc_id", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no partial group limit:\n$plan")
  }

  test("mixDomains hits expected per-domain counts, map-side only") {
    val weights = Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0)
    val mixed = Curation.mixDomains(docs, "source", "doc_id", weights)
    val plan = mixed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mixDomains shuffles:\n$plan")
    val got = mixed.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // src2 dropped entirely; unlisted domains exactly 1x
    assert(!got.contains("src2"))
    assert(got("src4") === base("src4"))
    // src0: between 2x and 3x (2 full epochs + hash-fraction of a third)
    assert(got("src0") >= 2 * base("src0") && got("src0") <= 3 * base("src0"))
    // src1: strict subset of one epoch
    assert(got("src1") > 0 && got("src1") < base("src1"))
    // determinism: same counts on re-run
    val again = Curation.mixDomains(docs, "source", "doc_id", weights)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === got)
  }

  test("hexThreshold endpoints") {
    assert(Curation.hexThreshold(0.0) === "00000000")
    assert(Curation.hexThreshold(1.0) === "ffffffff")
    assert(Curation.hexThreshold(0.5) === "80000000")
    assert(Curation.hexThreshold(0.25) === "40000000")
    // thresholds hard-coded in the p30_train_split oracle SQL
    assert(Curation.hexThreshold(0.8) === "cccccccd")
    assert(Curation.hexThreshold(0.9) === "e6666666")
  }

  test("hashSplit: disjoint-exhaustive, ratio-accurate, map-side, stable") {
    val splits = Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1)
    val out = Curation.hashSplit(docs, "doc_id", splits)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "hashSplit must not shuffle")
    // every row assigned to exactly one of the named splits
    assert(out.count() === docs.count())
    val counts = out.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(splits.map(_._1).toSet))
    val n = docs.count().toDouble
    assert(math.abs(counts("train") / n - 0.8) < 0.1)
    // membership is a pure function of the id: repartitioned input, same map
    val again = Curation.hashSplit(docs.repartition(7), "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    val first = out.collect().map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    assert(again === first)
    // growing the corpus never reassigns existing rows
    val grown = Curation.hashSplit(
      docs.union(docs.withColumn("doc_id", col("doc_id") + 100000L)),
      "doc_id", splits)
      .filter(col("doc_id") < 100000L)
      .collect().map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    assert(grown === first)
  }

  test("epochShuffle: reproducible permutation, distinct per epoch") {
    val base = docs.select(col("doc_id"))
    def order(epoch: Int) = Curation.epochShuffle(base, "doc_id", epoch)
      .orderBy(col("shuffle_key")).collect().map(_.getLong(0)).toSeq
    val e1 = order(1)
    assert(e1 === order(1), "same epoch must reproduce the same order")
    assert(e1.toSet === order(2).toSet, "a shuffle is a permutation")
    assert(e1 !== order(2), "different epochs must permute differently")
    // no global window in the plan (scale: the order is the sort, not a rank)
    val plan = Curation.epochShuffle(base, "doc_id", 1)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("dsirResample: target enrichment, exact-k, determinism, coverage") {
    val full = Engine.table(spark, sfDir, "documents")
    val r1 = Curation.dsirResample(full, "doc_id", "text",
      isTarget = col("lang") === "en", k = 100)
    val rows = r1.collect()
    // one output row per input doc; exactly k selected
    assert(rows.length === full.count())
    val selected = rows.filter(_.getAs[Boolean]("selected"))
    assert(selected.length === 100)
    // importance weights pull toward the target: the selected set must be
    // enriched in the target language vs the corpus base rate (193/500)
    val selIds = selected.map(_.getLong(0)).toSet
    val enRate = full.filter(col("doc_id").isin(selIds.toSeq: _*))
      .filter(col("lang") === "en").count().toDouble / selIds.size
    assert(enRate > 0.55,
      f"selected set must be target-enriched, got en rate $enRate%.2f " +
        "(base rate 0.39)")
    // deterministic: a repartitioned rerun selects the identical set
    val r2 = Curation.dsirResample(full.repartition(7), "doc_id", "text",
      isTarget = col("lang") === "en", k = 100)
    val sel2 = r2.filter(col("selected")).collect().map(_.getLong(0)).toSet
    assert(sel2 === selIds)
    // a pure-target doc outranks (in expectation) a pure-non-target one:
    // spot-check that log weights order sensibly
    val byLang = full.select(col("doc_id"), col("lang"))
      .join(r1.select(col("doc_id"), col("log_weight")), "doc_id")
    val avgEn = byLang.filter(col("lang") === "en")
      .agg(avg("log_weight")).head.getDouble(0)
    val avgZh = byLang.filter(col("lang") === "zh")
      .agg(avg("log_weight")).head.getDouble(0)
    assert(avgEn > avgZh,
      s"target docs must average higher log weight ($avgEn vs $avgZh)")
  }
}
