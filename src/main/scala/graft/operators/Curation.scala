package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data assembly: deterministic
  * per-stratum quota sampling and target-weight domain mixing.
  *
  * Everything here is deterministic by construction — sample membership and
  * ordering derive from md5 of row keys, never from an RNG — so a curated
  * corpus is reproducible across runs, engines, and cluster sizes, and the
  * operators are oracle-verifiable in plain SQL (the p23/p24 catalog
  * queries hash-match DuckDB). That is the property a 100 TB curation run
  * needs: re-executing a failed stage or re-partitioning the input cannot
  * change which documents were picked.
  *
  * Scale: quotaSample is one window shuffle keyed by stratum with the
  * rank<=q filter pushed as WindowGroupLimit (partial top-q before the
  * exchange); mixDomains is a pure map-side explode — no shuffle at all.
  */
object Curation {

  /** First 8 hex chars of md5 of the utf8 string rendering — a uniform
    * deterministic draw, compared lexicographically against a hex threshold
    * (lowercase hex compares like the number it encodes).
    */
  private def hashKey(c: Column): Column =
    substring(md5(c.cast("string").cast("binary")), 1, 8)

  /** 8-digit lowercase hex threshold for fraction f in [0,1]. */
  private[operators] def hexThreshold(f: Double): String =
    f"${math.min(math.max(f, 0.0), 1.0) * 4294967296.0}%.0f".toLong
      .min(0xffffffffL).toInt.toHexString.reverse.padTo(8, '0').reverse.mkString

  /** Deterministic quota sample: the `quota` rows of each stratum that rank
    * first by (md5(id), id) — a fixed-size uniform-without-replacement
    * sample per stratum whose membership is a pure function of the ids.
    * Output carries `__rank` (1-based within the stratum).
    */
  def quotaSample(df: DataFrame, stratumCol: String, idCol: String,
      quota: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hashKey(col(idCol)), col(idCol))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= quota)
  }

  /** Deterministic train/validation/test split: each row is assigned to the
    * named split whose cumulative-fraction interval contains its md5 draw.
    * Membership is a pure function of the id — no RNG, no `randomSplit`
    * sampling drift — so the same document lands in the same split across
    * runs, engines, repartitions, and data growth (new rows never move old
    * rows between splits, unlike percentile-based splitting). Map-side only.
    */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0), "split fractions must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val draw = hashKey(col(idCol))
    // upper threshold of every split but the last (which takes the rest)
    val cum = splits.init
      .scanLeft(("", 0.0)) { case ((_, acc), (n, f)) => (n, acc + f) }.tail
    val first = when(draw < lit(hexThreshold(cum.head._2)), cum.head._1)
    val assigned = cum.tail.foldLeft(first) { case (acc, (name, c)) =>
      acc.when(draw < lit(hexThreshold(c)), name)
    }
    df.withColumn(splitCol, assigned.otherwise(splits.last._1))
  }

  /** Domain mixing to target weights: weight w replicates every row of the
    * domain floor(w) times and admits one further copy for a deterministic
    * md5-chosen w-minus-floor(w) fraction of its rows (epochs 0..ceil(w)-1;
    * the standard up/down-sampling mix for training corpora — weight 0.25
    * keeps a quarter of the domain, weight 2.5 gives every row twice plus a
    * half-chance third copy). Domains absent from `weights` get
    * `defaultWeight`. Map-side only: explode(sequence) + filter, no
    * shuffle; output adds an `epoch` column (0-based copy index).
    */
  def mixDomains(df: DataFrame, domainCol: String, idCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 100),
      "domain weights must be in [0, 100]")
    def chain(f: Double => Column): Column =
      weights.toSeq.sortBy(_._1).foldRight(f(defaultWeight)) {
        case ((d, w), acc) => when(col(domainCol) === d, f(w)).otherwise(acc)
      }
    val wFloor = chain(w => lit(math.floor(w).toLong))
    val wCeil = chain(w => lit(math.ceil(w).toLong))
    val thr = chain(w => lit(hexThreshold(w - math.floor(w))))
    val draw = hashKey(concat(col(idCol).cast("string"), lit(":"), col(domainCol)))
    df.withColumn("epoch",
        explode(sequence(lit(0L), greatest(wCeil, lit(1L)) - 1L)))
      .filter(col("epoch") < wFloor ||
        (col("epoch") === wFloor && draw < thr))
      .withColumn("epoch", col("epoch").cast("int"))
  }

  /** Deterministic per-epoch corpus shuffle: every row gets a
    * `shuffle_key` = md5(id ":" epoch) and training order IS the key's
    * sort order — reproducible across runs/engines/partitionings, and a
    * different (but equally reproducible) permutation per epoch. No global
    * rank is materialized (a global row_number is a single-partition
    * bottleneck at 100 TB); consumers `orderBy(shuffle_key)` — a
    * range-partitioned distributed sort — or write files in key order.
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int): DataFrame =
    df.withColumn("shuffle_key",
      md5(concat(col(idCol).cast("string"), lit(":"), lit(epoch.toString))
        .cast("binary")))

  /** DSIR-style importance resampling (the public data-selection design:
    * Xie et al. 2023, arXiv:2302.03169 — importance weights from n-gram
    * models + Gumbel-top-k): every document scores
    * `log w = Σ_bigrams (ln p_target(bg) − ln p_raw(bg))` under add-k
    * multinomials over the corpus bigram universe (target model trained on
    * the `isTarget` rows, raw on everything), deterministic Gumbel noise
    * (from md5 of the id — reproducible across runs/engines/partitionings
    * like every Curation op) is added, and the `k` highest keys are
    * selected — importance-weighted sampling without replacement toward
    * the target domain.
    *
    * Output: one row per input doc — id, n_bigrams, log_weight (4dp),
    * sample_key (4dp), selected.
    *
    * Scale: two bigram-keyed count aggregations, one keyed join back to
    * doc bigrams, a per-doc aggregation, and a distributed top-k
    * (TakeOrderedAndProject — k ids to the driver, broadcast back as the
    * selection flag); never a global window, never an RNG.
    */
  def dsirResample(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, k: Int, addK: Double = 0.5): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val docBg = df.select(col(idCol),
      explode(TextAnalysis.bigrams(col(textCol))).as("bg"))
    val rawC = docBg.groupBy(col("bg"))
      .agg(count(lit(1)).cast("double").as("c_raw"))
    val tgtC = df.filter(isTarget)
      .select(col(idCol), explode(TextAnalysis.bigrams(col(textCol))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).cast("double").as("c_tgt"))
    // model totals + bigram-universe size (broadcast scalars)
    val totals = rawC.agg(sum(col("c_raw")).as("n_raw"),
      count(lit(1)).cast("double").as("n_distinct"))
    val tgtTotal = tgtC.agg(sum(col("c_tgt")).as("n_tgt"))
    // per-bigram log ratio under add-k smoothing over the SHARED universe
    // (every corpus bigram has c_raw >= 1; absent-in-target coalesces to 0)
    val ratios = rawC.join(tgtC, Seq("bg"), "left")
      .crossJoin(broadcast(totals)).crossJoin(broadcast(tgtTotal))
      .select(col("bg"),
        (log((coalesce(col("c_tgt"), lit(0.0)) + addK) /
            (coalesce(col("n_tgt"), lit(0.0)) + lit(addK) * col("n_distinct"))) -
          log((col("c_raw") + addK) /
            (col("n_raw") + lit(addK) * col("n_distinct")))).as("lr"))
    val scored0 = docBg.join(ratios, "bg")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lr")).as("logw"))
    // deterministic Gumbel: u in (0,1) from the first 8 md5 hex chars of
    // the id; g = -ln(-ln u). Keys round to 4dp BEFORE ranking so the
    // selection is stable across engines' last-bit log differences.
    val u = (conv(hashKey(col(idCol)), 16, 10).cast("double") + 0.5) /
      4294967296.0
    val scored = df.select(col(idCol)).join(scored0, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("logw"), lit(0.0)), 4).as("log_weight"),
        round(coalesce(col("logw"), lit(0.0)) - log(-log(u)), 4)
          .as("sample_key"))
    val chosen = scored.orderBy(col("sample_key").desc, col(idCol))
      .limit(k).select(col(idCol).as("__sel"))
    scored.join(broadcast(chosen), col(idCol) === col("__sel"), "left")
      .select(col(idCol), col("n_bigrams"), col("log_weight"),
        col("sample_key"), col("__sel").isNotNull.as("selected"))
  }
}
