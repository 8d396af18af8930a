package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{HiveHash, Literal, Murmur3Hash, Pmod}
import org.apache.spark.sql.functions._

/** Registry-override guard (r15 verdict ask #4). The r15 `hash` incident:
  * registering a Hive name rebinds Spark-internal DataFrame code too,
  * because in Spark 4 `org.apache.spark.sql.functions.X` builds an
  * UnresolvedFunction resolved BY NAME through the session registry.
  * This spec (a) pins that resolution fact for every override class the
  * engine ships, so a Spark upgrade that changes the rule surfaces here;
  * (b) proves the engine's known internal placement sites are
  * registry-PROOF by poisoning `hash` and asserting placement is
  * unchanged; (c) bans — by source scan — engine-internal DataFrame-API
  * calls to the overridden names whose Hive semantics change results on
  * the engine's own argument domains.
  *
  * Adjudicated-safe internal uses (NOT banned, domain-checked r16):
  *  - greatest/least: Hive override differs only when an argument is
  *    NULL; every engine site feeds non-null args (sizes, lengths,
  *    coalesced components) or propagates NULL identically either way.
  *  - pmod: differs only for NEGATIVE divisors; engine sites use
  *    positive bucket/band counts (equivalence pinned below).
  *  - trunc: Hive override is a superset (adds bare 'Q').
  *  - array_join: differs only on EMPTY arrays; both engine sites
  *    (TextAnalysis span grams, collect_list rebuild) are non-empty by
  *    construction.
  *  - sqrt (r16): differs only for NEGATIVE input (Hive NULL vs NaN);
  *    every engine site feeds norms/distances/retail prices — provably
  *    non-negative domains (Similarity/Geo build math.sqrt or Catalyst
  *    Sqrt directly anyway).
  *  - log (r16): 1-arg form is bit-identical to the builtin; the 2-arg
  *    base<=1 NULL only matters for bases the engine never uses
  *    (TextSearch/Curation are all 1-arg natural logs).
  *  - rlike/regexp (r16): differ only for the EMPTY pattern; the one
  *    engine site (TextFormats' RegexSerDe) requires a non-empty
  *    pattern by construction.
  *  - acos/asin (r16): differ only OUTSIDE [-1,1] (Hive NULL vs NaN);
  *    engine trig sites (Geo haversine, FunctionQueries) feed
  *    normalized ratios inside the domain.
  */
class RegistryOverrideGuardSpec extends SparkSpec {

  test("Spark 4 resolves functions.* through the session registry: the " +
      "engine's Hive overrides rebind the DataFrame API too (pinned)") {
    val df = spark.range(1)
    // hash -> HiveHash (the r15 incident's proof)
    assert(df.select(hash(lit(1))).head.getInt(0) ===
      HiveHash(Seq(Literal(1))).eval().asInstanceOf[Int])
    assert(HiveHash(Seq(Literal(1))).eval() !==
      new Murmur3Hash(Seq(Literal(1))).eval())
    // greatest/least -> NULL-on-any-NULL (Hive), not skip-null (builtin)
    assert(df.select(greatest(lit(null).cast("int"), lit(1))).head.isNullAt(0))
    assert(df.select(least(lit(null).cast("int"), lit(1))).head.isNullAt(0))
    // pmod -> divisor-signed (Hive): pmod(7,-3) = -2, builtin clamps to 1
    assert(df.select(pmod(lit(7), lit(-3))).head.getInt(0) === -2)
    // stddev -> population (Hive default), not sample
    assert(math.abs(spark.range(1, 3).agg(stddev(col("id")))
      .head.getDouble(0) - 0.5) < 1e-12)
    // array_join -> NULL on empty input (Hive), not ""
    assert(df.select(array_join(array().cast("array<string>"), ","))
      .head.isNullAt(0))
    // sqrt -> NULL on negative input (Hive), not NaN (r16)
    assert(df.select(sqrt(lit(-1.0))).head.isNullAt(0))
    assert(df.select(sqrt(lit(4.0))).head.getDouble(0) === 2.0)
    // 2-arg log -> NULL for base <= 1 (Hive); valid bases unchanged (r16)
    assert(df.select(log(0.5, lit(2.0))).head.isNullAt(0))
    assert(df.select(log(2.0, lit(8.0))).head.getDouble(0) === 3.0)
    // acos/asin -> NULL outside [-1,1] (Hive), not NaN (r16)
    assert(df.select(acos(lit(10.0))).head.isNullAt(0))
    assert(df.select(asin(lit(1.0))).head.getDouble(0) === math.Pi / 2)
  }

  test("bucket placement is registry-proof: poisoning `hash` changes " +
      "neither PartitionTransforms.murmur3 nor ACID bucket routing") {
    val reg = spark.sessionState.functionRegistry
    val saved = reg.lookupFunctionBuilder(FunctionIdentifier("hash")).get
    val dirA = java.nio.file.Files
      .createTempDirectory("graft_regguard_a_").toString + "/t"
    val dirB = java.nio.file.Files
      .createTempDirectory("graft_regguard_b_").toString + "/t"
    def rows = spark.range(100).select(
      col("id").as("k"), (col("id") * 3 % 17).as("v"))
    def placement(dir: String): Seq[(Int, Long)] =
      graft.sources.AcidOrc.rawEvents(spark,
          (0 until 4).map(b => f"$dir/delta_1_1/bucket_$b%05d"): _*)
        .select(col("bucket"), col("row.k"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    try {
      // baseline placement under the engine's normal registry state
      graft.sources.AcidOrc.appendDelta(spark, dirA, 1L, rows, buckets = 4)
      val before = placement(dirA)
      assert(before.map(_._1).distinct.size === 4,
        "fixture too degenerate: rows landed in fewer than 4 buckets")
      // poison: if any placement site resolved `hash` by name, every row
      // would now land in pmod(abs(0), 4) = bucket 0
      reg.createOrReplaceTempFunction("hash",
        _ => Literal(0), "built-in")
      assert(spark.range(1).select(hash(lit(42))).head.getInt(0) === 0,
        "poison registration did not take — test harness broken")
      assert(graft.plans.PartitionTransforms.murmur3(lit(7)) != null)
      assert(spark.range(1)
          .select(graft.plans.PartitionTransforms.murmur3(lit(7)))
          .head.getInt(0) ===
        new Murmur3Hash(Seq(Literal(7))).eval().asInstanceOf[Int],
        "PartitionTransforms.murmur3 consulted the registry")
      graft.sources.AcidOrc.appendDelta(spark, dirB, 1L, rows, buckets = 4)
      assert(placement(dirB) === before,
        "AcidOrc.appendDelta bucket routing consulted the registry")
    } finally reg.createOrReplaceTempFunction("hash", saved, "built-in")
  }

  test("positive-divisor pmod is override-invariant (the engine's bucket " +
      "and band arithmetic domain)") {
    val pairs = Seq((0, 7), (6, 7), (7, 7), (13, 7), (-1, 7), (-13, 7),
      (Int.MaxValue, 16), (Int.MinValue + 1, 16))
    pairs.foreach { case (a, n) =>
      val hive = spark.range(1).select(pmod(lit(a), lit(n))).head.getInt(0)
      val builtin = Pmod(Literal(a), Literal(n)).eval().asInstanceOf[Int]
      assert(hive === builtin, s"pmod($a, $n) diverged: $hive vs $builtin")
    }
  }

  test("engine internals (plans/sources/operators/streaming/Engine) make " +
      "no DataFrame-API calls to result-changing overridden names") {
    // the names whose Hive override changes results on domains engine
    // code plausibly uses: hash (always differs), stddev/std/variance
    // (sample vs population), add_months (end-of-month snap)
    val banned = Seq("hash", "stddev", "stddev_samp", "std", "variance",
      "add_months")
    val re = ("(?<![\\w.])(" + banned.mkString("|") + ")\\s*\\(").r
    val roots = Seq("plans", "sources", "operators", "streaming")
      .map(d => new java.io.File(s"src/main/scala/graft/$d")) :+
      new java.io.File("src/main/scala/graft/Engine.scala")
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(files)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    assert(roots.forall(_.exists()),
      s"source roots moved — update this spec (${roots.filterNot(_.exists())})")
    val offenders = roots.flatMap(files).flatMap { f =>
      val src = new String(java.nio.file.Files.readAllBytes(f.toPath))
      // strip block comments, line comments, and string literals — the
      // ban is on CODE, not prose or registration names
      val stripped = src
        .replaceAll("(?s)/\\*.*?\\*/", " ")
        .replaceAll("//[^\n]*", " ")
        .replaceAll("\"\"\"(?s).*?\"\"\"", "\"\"")
        .replaceAll("\"(\\\\.|[^\"\\\\])*\"", "\"\"")
      re.findAllMatchIn(stripped).map(m => s"${f.getName}: ${m.group(1)}(")
        .toSeq
    }
    assert(offenders.isEmpty,
      "engine-internal DataFrame-API call to an overridden name — build " +
        "the Catalyst expression directly (PartitionTransforms.murmur3 " +
        s"pattern) instead: ${offenders.mkString(", ")}")
  }
}
