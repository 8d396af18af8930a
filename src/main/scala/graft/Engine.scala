package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + testdata catalog bootstrap.
  *
  * The engine is a thin layer over `org.apache.spark.sql`: a SparkSession with
  * scale-appropriate defaults (AQE on, shuffle partitions sized to the local
  * parallelism instead of the 200 default), the driver testdata registered as
  * temp views, and the Hive-gap function registry installed (see
  * [[graft.functions.HiveFunctions]]).
  *
  * Mirrors the role of Hive's session + metastore bootstrap
  * (ref: ql/src/java/org/apache/hadoop/hive/ql/session/SessionState.java) but
  * delegates all catalog/planning machinery to Spark.
  */
object Engine {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Build a session with scale-appropriate defaults. On a real cluster the
    * same settings apply; only `master` changes.
    */
  def session(master: String = "local[32]", appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    configure(spark)
    spark
  }

  /** Apply engine settings + function registrations to an externally-built
    * session (the driver's Verify/Bench mains construct their own).
    */
  def configure(spark: SparkSession): SparkSession = {
    // iterative operators release superseded localCheckpoint frames by
    // design (releaseCheckpoint below); every release logs an expected
    // "lineage has been truncated" WARN from the concrete RDD class —
    // demote the rdd package so bench/test output stays readable
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    // the Hive-gap registry deliberately overrides a handful of builtin
    // names (lcase, nvl2, ...) for Hive semantics — the per-override
    // "replaced a previously registered function" WARN is expected
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry",
      org.apache.logging.log4j.Level.ERROR)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Hive string<->numeric coercions need non-ANSI mode (SURVEY §7).
    // (INSERT-side leniency is NOT a conf: LEGACY store assignment is
    // disallowed for DSv2 writes — plans.LenientInsertCasts adds Hive's
    // implicit casts per statement instead.)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    // events.parquet carries TIMESTAMP(NANOS) which Spark has no native type
    // for: read as long and convert (see table()).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Hive's map constructors keep the LAST value for a duplicated key
    // (GenericUDFStringToMap/GenericUDFMap put into a LinkedHashMap —
    // str_to_map('val:1,val:2') answers {val: 2}, pinned by
    // str_to_map_utf8.q) where Spark's default policy throws
    // DUPLICATED_MAP_KEY.
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    // cost-based optimization from ANALYZE'd statistics (join reorder,
    // broadcast decisions) — the Catalyst analog of Hive's CBO+StatsOptimizer.
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    // ANALYZE ... FOR COLUMNS also collects equi-height histograms — the
    // CBO's selectivity estimates for skewed columns (the analog of Hive's
    // column histogram stats, ref ql/.../ColStatsProcessor.java). Costs one
    // extra aggregation per ANALYZE'd column, nothing on the query path.
    spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
    // Runtime bloom-filter join pruning — the Catalyst analog of Hive's
    // dynamic semijoin reduction (ref ql/.../DynamicPartitionPruningOptimization
    // + hive.tez.dynamic.semijoin.reduction): a selective filter on the dim
    // side of a shuffle join injects a bloom might_contain() onto the fact
    // scan, cutting the shuffled fact rows before the exchange. On by default
    // in Spark 4; set explicitly so the engine contract doesn't silently
    // change with Spark defaults. Size thresholds stay at Spark defaults
    // (creation side ≤10MB builds the filter; fact scans ≥10GB apply it) —
    // sized for the 100 TB target, not for local toy data.
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // Joins between tables bucketed at DIFFERENT counts (ratio ≤ the
    // default 4) coalesce the finer side's buckets instead of shuffling
    // both — the Hive contract where 8-bucket and 4-bucket tables SMB-join
    // because one hash refines the other (ref ql/.../AbstractSMBJoinProc
    // .java checkConvertBucketMapJoin bucket-count divisibility). Off by
    // default in Spark; on here because bucketed snapshot tables make the
    // case common.
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
    // Bucketed scans report their SORTED BY ordering (single-file buckets
    // only — Spark still verifies that). Spark turned this off by default
    // because externally-written bucketed files may lie about their sort
    // (SPARK-28595); THIS engine owns every snapshot-table bucketed write
    // path and sorts with the writer's required prefix, so the declared
    // ordering is a guarantee — and it is what makes SMB merge joins
    // sort-free, the whole point of the reference's SORTED BY contract.
    //
    // CONTRACT (session-wide, documented): the flag is plan-time and also
    // covers external `bucketBy` catalog tables the engine never wrote.
    // This session adopts the Hive SORTED BY semantics — a bucketed table
    // declaring a sort PROMISES its files honor it (that is what SORTED BY
    // means in the reference; a lying writer is corrupt there too). If you
    // must query an external bucketed+sorted table whose files may violate
    // their declared sort, opt out BEFORE Engine.configure with
    // `graft.trustBucketedSortOrdering=false` (sort-free SMB on engine
    // tables is then lost; correctness everywhere else is unaffected).
    if (spark.conf.get("graft.trustBucketedSortOrdering", "true").toBoolean)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    graft.functions.HiveFunctions.registerAll(spark)
    graft.functions.GeoFunctions.registerAll(spark)
    graft.plans.MaterializedViews.install(spark)
    graft.plans.SnapshotSql.register(spark)
    graft.plans.NamedTables.bootstrap(spark)
    graft.plans.Authz.bootstrap(spark)
    graft.plans.Workload.bootstrap(spark)
    spark
  }

  /** Free the storage blocks behind a `localCheckpoint()`ed frame.
    *
    * `Dataset.unpersist` does not release checkpoint blocks (they are RDD
    * storage, not cache-manager entries) and the ContextCleaner only reclaims
    * them when the RDD object happens to be GC'd — so iterative operators
    * that checkpoint per sweep must release superseded frames explicitly or
    * MEMORY_AND_DISK blocks accumulate for the life of the session. A
    * released frame is NOT recomputable (the checkpoint truncated its
    * lineage): only release frames that can never be scanned again.
    */
  private[graft] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))

  // Memoized UNEXECUTED table frames per (session, path): `spark.read
  // .parquet` re-lists the files and re-reads parquet footers for schema
  // inference on EVERY call — measured ~90–115 ms of driver-side work per
  // call at bench scale (r18 ProfileQuery/SplitProbe: q04 built its frame in
  // 478 ms, six table reads), the per-query fixed overhead the r17 verdict
  // flagged on 33/37 bench entries. The temp-view path (Engine.register)
  // already amortizes exactly this metadata; this gives the DataFrame path
  // the same treatment. NOT result caching: the value is an immutable
  // logical plan (schema + file listing) — every execution still scans the
  // parquet inputs. Safe because the engine's named base tables are
  // immutable testdata (every caller passes the driver's read-only sfDir);
  // weak session keys let dead sessions drop out.
  // Bounded LRU, NOT a weak map: a DataFrame value strongly references its
  // SparkSession, so weak session keys could never be collected through
  // this cache (value→key chain) — and scheduledTick clones sessions, so an
  // unbounded map would pin every clone's sessionState for the JVM's life.
  // 256 entries bounds retention at ~25 sessions × 10 tables; eviction just
  // re-pays one metadata read.
  private val tableFrames =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        size() > 256
    }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    configure(spark)
    val key = (spark, s"$sfDir/$name")
    tableFrames.synchronized(Option(tableFrames.get(key))).getOrElse {
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      val df = if (name == "events") normalizeEventTs(raw) else raw
      tableFrames.synchronized {
        Option(tableFrames.get(key)).getOrElse { // lost race: keep the first
          tableFrames.put(key, df); df
        }
      }
    }
  }

  /** Engine-wide `ts` type: session-zoned TIMESTAMP at µs precision,
    * whatever physical type the file stored. Testdata generations have
    * shipped `ts` as TIMESTAMP(NANOS) (arrives as long under nanosAsLong)
    * and as TIMESTAMP_NTZ(µs); both normalize to the same UTC instants.
    */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        // ns-precision epoch long; integer DIV to µs avoids double rounding
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case Some(TimestampNTZType) =>
        // wall-clock µs; session TZ is UTC, so the instant is unchanged
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  // Current registered dir per live session (views are session-global, so
  // the cache must be invalidated when the dir changes; weak keys let dead
  // sessions drop out instead of colliding on reused identity hashes).
  private val registeredDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register all testdata tables as temp views (idempotent per session until
    * the dir changes, then re-registered).
    */
  def register(spark: SparkSession, sfDir: String): SparkSession = {
    if (registeredDir.get(spark) != sfDir) {
      configure(spark)
      tableNames.foreach { n => table(spark, sfDir, n).createOrReplaceTempView(n) }
      registeredDir.put(spark, sfDir)
    }
    spark
  }

  /** The SQL front door (SURVEY §7): `spark.sql` after the engine's
    * registrations — functions, MV rewrite, and the data-dir tables are all
    * in place, so HiveQL-shaped statements run unchanged — plus the two
    * statement families plain Spark can't execute:
    *
    *   - DML statements (UPDATE / DELETE / MERGE / INSERT) against
    *     engine-managed tables dispatch to the COW / snapshot planners
    *     ([[graft.plans.SqlDml]]);
    *   - names registered in [[graft.plans.NamedTables]] resolve to fresh
    *     snapshot reads pre-analysis (extensions-bootstrapped sessions get
    *     the same via an injected analyzer rule);
    *   - table-maintenance verbs (RESTORE TABLE / OPTIMIZE / VACUUM) that
    *     are parse errors to Spark dispatch to the snapshot lifecycle API
    *     ([[graft.plans.SqlMaintenance]]);
    *   - Hive's NULL-as-largest default sort placement is made explicit
    *     in the statement text pre-parse ([[graft.plans.DefaultNullOrder]]);
    *   - quantified comparisons (`ANY`/`SOME`/`ALL` subqueries) and
    *     DISTINCT window aggregates — Hive surface Spark lacks — lower
    *     to exact compositions ([[graft.plans.QuantifiedSubqueries]],
    *     [[graft.plans.DistinctWindows]]).
    *
    * Front-door cost (re-measured r17 after fusing the post-analysis
    * semantic rewrites into ONE analyzer pass —
    * [[graft.plans.HiveSemantics]]; FrontDoorCostSpec is the
    * measurement harness): ~1.0 ms driver-side per statement over
    * Spark's own ~5.7 ms analyze cost (r16: ~5 ms — the fusion plus
    * the gates pay off). The remaining overhead is the text scans,
    * the gated plan walks, and the deliberate double parse when
    * nothing rewrites. Statements with real plans are
    * noise-dominated; new post-analysis semantics must join
    * HiveSemantics rather than adding analyzer passes.
    */
  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    register(spark, sfDir)
    // the security context itself is not settable through the SQL front
    // door by non-admins (the reference's restricted-conf list)
    graft.plans.Authz.guardSetStatement(spark, query)
    // `SET hive.<key>=<v>` spellings with a live Spark equivalent flip
    // the matching Spark conf too (e.g. quoted.identifiers=none →
    // quotedRegexColumnNames); the SET statement itself still runs
    graft.plans.HiveConfs.maybeMap(spark, query)
    // SET ROLE is the one verb that must intercept pre-parse (Spark 4's
    // parser rejects `SET ROLE x` outright). It intercepts whenever ANY
    // authz state exists — not only under enforcement — so a bootstrap
    // script's `SET ROLE NONE/ALL` issued before flipping enforcement on
    // updates the active-role selection instead of silently no-opping; a
    // session that never touched authz still gets Spark's canonical error.
    if (graft.plans.Authz.enabled(spark) || graft.plans.Authz.hasState) {
      graft.plans.Authz.maybeSetRole(spark, query) match {
        case Some(df) => return df
        case None => ()
      }
    }
    // filter-form / partial-spec DROP PARTITION intercepts pre-parse:
    // the comparator spelling is a parse error to Spark and the partial
    // equality spelling hits v1's full-spec requirement; full-equality
    // statements fall through untouched (PartitionDdl gates authz itself)
    graft.plans.PartitionDdl.maybeSql(spark, query) match {
      case Some(df) => return df
      case None => ()
    }
    // Hive sorts NULL as the LARGEST value by default (ASC → NULLS LAST,
    // DESC → NULLS FIRST); Spark's parser defaults the opposite and the
    // spelling is lost after the parse — make it explicit in the text.
    // Likewise CAST(x AS VARCHAR(n)) truncates in Hive; Spark's parser
    // discards the length, so that too is a text rewrite.
    val query0 = graft.plans.TempTables(spark,
      graft.plans.StoredAs(spark,
        graft.plans.EmptyGroupBy(spark,
          graft.plans.VarcharCasts(spark,
            graft.plans.DefaultNullOrder(spark, query)))))
    val parsed =
      try Some(spark.sessionState.sqlParser.parsePlan(query0))
      catch { case scala.util.control.NonFatal(_) => None }
    parsed match {
      case None =>
        // maintenance + authz verbs (RESTORE/OPTIMIZE/VACUUM, GRANT/REVOKE/
        // policies) are parse errors to Spark — they can only ever arrive
        // here, so nothing is shadowed
        graft.plans.SqlMaintenance.maybeRun(spark, query)
          .orElse(graft.plans.Authz.maybeSql(spark, query))
          .orElse(graft.plans.Workload.maybeSql(spark, query))
          .orElse(graft.plans.Macros.maybeSql(spark, query))
          .orElse(graft.plans.ScheduledQueries.maybeSql(spark, query,
            (s, q) => sql(s, sfDir, q)))
          .orElse(maybeRunHplsql(spark, sfDir, query))
          .orElse(maybeCastFormat(spark, sfDir, query))
          .orElse(maybeQuantified(spark, sfDir, query))
          .orElse(maybeUniqueJoin(spark, sfDir, query))
          .orElse(graft.plans.SchemaEvolution.maybeSql(spark, query))
          .orElse(maybeBucketSample(spark, sfDir, query))
          .orElse(maybeCommaLimit(spark, sfDir, query))
          .orElse(maybeTypeSpellings(spark, sfDir, query))
          .getOrElse(spark.sql(query)) // surface the canonical parse error
      case Some(plan) =>
        // privilege check first (deny-by-default when authz is enabled),
        // then row-filter/column-mask substitution on the read path —
        // including the source subtrees of DML statements, which SqlDml
        // compiles itself. The parsed-command guard catches SET/RESET
        // forms comments hid from the pre-parse regex.
        // Hive resolves CTE names non-positionally — reorder forward
        // references FIRST so authz's positional CTE scope, the DML
        // compiler, and Spark's substitution all see dependency order
        val plan0 = graft.plans.CteForwardRefs(plan)
        graft.plans.TypeLimits.check(plan0)
        graft.plans.Authz.guardSetPlan(spark, plan0)
        graft.plans.Authz.checkStatement(spark, plan0)
        // Hive v1 schema evolution (REPLACE COLUMNS / CHANGE COLUMN
        // re-typing) — shapes Spark's catalog refuses; after authz
        graft.plans.SchemaEvolution.maybePlan(spark, plan0) match {
          case Some(df) => return df
          case None => ()
        }
        // (SHOW TABLES reshapes to Hive's one-column tab_name listing
        // inside SqlDml.runShowTables, which also merges the engine's
        // registered snapshot names)
        val gated = graft.plans.Authz.applyPoliciesToDmlSources(spark, plan0)
        graft.plans.SqlDml.maybeRun(spark, gated).getOrElse {
          val secured = graft.plans.Authz.applyPolicies(spark, plan0)
          val substituted = graft.plans.VirtualColumns.maybeSubstitute(
            graft.plans.OrderlessWindows(graft.plans.DistinctWindows(spark,
              graft.plans.HiveRegex(
              graft.plans.ProjectedInSubqueries(
              graft.plans.EmptyGroupingSets(
              graft.plans.GroupingSetsDedup(
              graft.plans.LenientInsertCasts(spark,
                graft.plans.ViewColumnNames(spark,
                  graft.plans.CtePartialAliases(spark,
                    graft.plans.NamedTables.substitute(spark, secured)))))))))),
            query0)
          // char columns reaching functions see the STRIPPED value
          // (Hive's HiveChar contract) — post-analysis, so it knows
          // which attributes carry char metadata
          val charFixed =
            graft.plans.CharStrippedFunctions(spark, substituted)
          // the FUSED post-analysis Hive-semantics pass (one analyzer
          // run): decimal→integral overflow-NULL casts, timestamp
          // sum/avg coercion, non-boolean WHERE coercion
          val boolFixed = graft.plans.HiveSemantics(spark, charFixed)
          // (map-typed GROUP BY keys need no rewrite on Spark 4:
          // InsertMapSortInGroupingExpressions normalizes them
          // natively, nested values included — verified by
          // EmptyGroupingSetsAdviceSpec/QtestGroupbyWave16zSpec)
          // LAST: materialization EXECUTES CTE definitions, which must
          // only happen after authz adjudicated and policies substituted
          val materialized = graft.plans.CteMaterialize(spark, boolFixed)
          val df =
            if (materialized eq plan) spark.sql(query0)
            else org.apache.spark.sql.GraftShims.ofRows(spark, materialized)
          maybeCacheResult(spark, df)
        }
    }
  }

  /** The deployment's scheduled-query tick (cron / Airflow / streaming
    * trigger): hydrates persisted schedules through this front door, then
    * runs everything due — a restarted JVM's first tick executes the
    * durable nightly schedules (ref ql/.../scheduled/
    * ScheduledQueryExecutionService.java's poll loop, minus the timer
    * thread the deployment already owns).
    */
  def scheduledTick(spark: SparkSession, sfDir: String,
      now: Long = System.currentTimeMillis()): Seq[String] = {
    register(spark, sfDir)
    // durable deployments tick in a CLONED session: owner-identity swaps
    // mutate the clone's conf, so concurrent statements on the caller's
    // session are never authorized as a schedule's owner (the reference
    // runs scheduled queries in their own session for the same reason).
    // Without a durable catalog there is nothing to hydrate into a clone —
    // session-local schedules tick in place.
    val session =
      if (spark.conf.getOption(graft.plans.NamedTables.CatalogConfKey)
          .exists(_.nonEmpty)) {
        // Spark 4 keeps cloneSession private[sql] — bridged via GraftShims
        val t = org.apache.spark.sql.GraftShims.cloneSession(spark)
        configure(t)
        t
      } else spark
    graft.plans.ScheduledQueries.runDue(session, now,
      (s, q) => sql(s, sfDir, q))
  }

  /** Procedural scripts through the same front door (the reference's
    * `hplsql -e` entry, folded into the SQL surface): an input Spark can't
    * parse that LEADS with a procedural construct runs as an HPL/SQL script
    * (see [[graft.hplsql.Hplsql]]); its raw statements re-enter this method.
    * Result: the script's last row-producing statement, else its PRINT
    * output as a one-column frame. Plain SQL typos don't start with these
    * keywords, so the canonical parse error still surfaces for them.
    */
  private val HplsqlHead =
    "(?is)^\\s*(DECLARE|PRINT|WHILE|LOOP|BEGIN|EXIT|CALL|RETURN|" +
      "FOR\\s+\\w+\\s+IN|IF\\b|EXECUTE\\s+IMMEDIATE|" +
      "CREATE\\s+(OR\\s+REPLACE\\s+)?(PROCEDURE|FUNCTION|PROC)\\b).*"
  private def maybeRunHplsql(spark: SparkSession, sfDir: String,
      query: String): Option[DataFrame] = {
    if (!query.matches(HplsqlHead)) return None
    val result = graft.hplsql.Hplsql.run(spark, query)(q => sql(spark, sfDir, q))
    result.lastResult.orElse {
      import spark.implicits._
      if (result.printed.nonEmpty) Some(result.printed.toDF("printed"))
      else Some(Seq.empty[String].toDF("printed"))
    }
  }

  /** Hive's MySQL-style `LIMIT <offset>,<count>` tail (ref ql/parse/
    * HiveParser.g limitClause — `offset_limit.q` is its qtest), a parse
    * error to Spark: rewritten to `LIMIT count OFFSET offset` and re-run
    * through this front door. Statement-TAIL only — nothing can follow a
    * top-level LIMIT, so the match can't fire inside a string literal or
    * subquery; inner comma-limits keep Spark's canonical error.
    */
  private def maybeCommaLimit(spark: SparkSession, sfDir: String,
      query: String): Option[DataFrame] = {
    val CommaLimit =
      """(?is)^(.*\blimit)\s+(\d+)\s*,\s*(\d+)\s*;?\s*$""".r
    // a trailing line comment could hold a comma-limit-looking tail of an
    // otherwise-invalid statement; never rewrite comment text
    val bare = query.replaceAll("""(?s)\s*--[^\n]*\s*$""", "")
    bare match {
      case CommaLimit(head, off, cnt) =>
        val rewritten = s"$head $cnt OFFSET $off"
        // only commit to the rewrite if it parses — otherwise the user
        // must see the canonical error against THEIR text, not ours
        val parses =
          try { spark.sessionState.sqlParser.parsePlan(rewritten); true }
          catch { case scala.util.control.NonFatal(_) => false }
        if (parses) Some(sql(spark, sfDir, rewritten)) else None
      case _ => None
    }
  }

  /** Hive type spellings Spark's parser rejects — `TIMESTAMP WITH LOCAL
    * TIME ZONE` and its `TIMESTAMPLOCALTZ` shorthand (ref serde
    * serdeConstants.TIMESTAMPLOCALTZ_TYPE_NAME; timestamptz*.q) — map to
    * Spark's `TIMESTAMP_LTZ`, which IS the same type: an instant
    * rendered in the session zone (Spark's default timestamp). Only
    * fires when the original text failed to parse AND the rewrite
    * parses, so no user identifier containing these words can be
    * touched (the regex requires type-spelling word boundaries).
    */
  private def maybeTypeSpellings(spark: SparkSession, sfDir: String,
      query: String): Option[DataFrame] = {
    val Re = """(?i)\btimestamp\s+with\s+local\s+time\s+zone\b|\btimestamplocaltz\b""".r
    if (Re.findFirstIn(query).isEmpty) return None
    val rewritten = Re.replaceAllIn(query, "timestamp_ltz")
    val parses =
      try { spark.sessionState.sqlParser.parsePlan(rewritten); true }
      catch { case scala.util.control.NonFatal(_) => false }
    if (parses) Some(sql(spark, sfDir, rewritten)) else None
  }

  /** Quantified comparison subqueries — `x <op> ANY|SOME|ALL (SELECT
    * ...)` — are Hive surface Spark's parser rejects; they lower to the
    * aggregate CASE form of [[graft.plans.QuantifiedSubqueries]] and
    * re-run through this front door. Fires only when the original text
    * failed to parse AND the rewrite parses.
    */
  private def maybeQuantified(spark: SparkSession, sfDir: String,
      query: String): Option[DataFrame] = {
    graft.plans.QuantifiedSubqueries.rewrite(query).flatMap { rewritten =>
      val parses =
        try { spark.sessionState.sqlParser.parsePlan(rewritten); true }
        catch { case scala.util.control.NonFatal(_) => false }
      if (parses) Some(sql(spark, sfDir, rewritten)) else None
    }
  }

  /** Hive's deterministic `TABLESAMPLE (BUCKET n OUT OF m ON expr)` (a
    * Spark parse error) — lowers via [[graft.plans.BucketSample]] to the
    * HiveHash bucket filter and re-runs through this front door.
    */
  private def maybeBucketSample(spark: SparkSession, sfDir: String,
      query: String): Option[DataFrame] = {
    graft.plans.BucketSample.rewrite(query).flatMap { rewritten =>
      val parses =
        try { spark.sessionState.sqlParser.parsePlan(rewritten); true }
        catch { case scala.util.control.NonFatal(_) => false }
      if (parses) Some(sql(spark, sfDir, rewritten)) else None
    }
  }

  /** Hive's `FROM UNIQUEJOIN [PRESERVE] ... SELECT` multi-way co-group
    * verb (a Spark parse error) — lowers via
    * [[graft.plans.UniqueJoin]] and re-runs through this front door.
    */
  private def maybeUniqueJoin(spark: SparkSession, sfDir: String,
      query: String): Option[DataFrame] = {
    graft.plans.UniqueJoin.rewrite(query).flatMap { rewritten =>
      val parses =
        try { spark.sessionState.sqlParser.parsePlan(rewritten); true }
        catch { case scala.util.control.NonFatal(_) => false }
      if (parses) Some(sql(spark, sfDir, rewritten)) else None
    }
  }

  /** SQL:2016 `CAST(x AS type FORMAT 'pattern')` (ref ql/udf/generic/
    * GenericUDFCastFormat.java — Hive's parser lowers it to cast_format),
    * a parse error to Spark: each occurrence rewrites to
    * `cast_format(x, 'type', 'pattern')` via a balanced-paren scan
    * (regexes can't hold nested parens in the operand) and the statement
    * re-runs through this front door. Only fires when the original text
    * failed to parse AND the rewrite parses — otherwise the canonical
    * error against the user's text stands.
    */
  private def maybeCastFormat(spark: SparkSession, sfDir: String,
      query: String): Option[DataFrame] = {
    rewriteCastFormat(query).flatMap { rewritten =>
      val parses =
        try { spark.sessionState.sqlParser.parsePlan(rewritten); true }
        catch { case scala.util.control.NonFatal(_) => false }
      if (parses) Some(sql(spark, sfDir, rewritten)) else None
    }
  }

  /** One pass of CAST...FORMAT rewriting; None when nothing matched. */
  private[graft] def rewriteCastFormat(q: String): Option[String] = {
    val CastRe = """(?i)\bCAST\s*\(""".r
    val Tail =
      """(?is)^\s*(\w+(?:\s*\(\s*\d+\s*\))?)\s+FORMAT\s+('(?:[^']|'')*')\s*$""".r
    var changed = false
    var out = q
    var search = 0
    var guard = 0
    while (guard < 64) {
      guard += 1
      CastRe.findFirstMatchIn(out.substring(search)) match {
        case None => return if (changed) Some(out) else None
        case Some(m) =>
          val open = search + m.end - 1 // index of '('
          // balanced scan respecting '…' literals
          var i = open + 1; var depth = 1
          var lastTopAs = -1
          while (i < out.length && depth > 0) {
            out.charAt(i) match {
              case '\'' => // skip the string literal ('' = escaped quote)
                i += 1
                while (i < out.length &&
                    (out.charAt(i) != '\'' ||
                      (i + 1 < out.length && out.charAt(i + 1) == '\''))) {
                  i += (if (out.charAt(i) == '\'') 2 else 1)
                }
              case '(' => depth += 1
              case ')' => depth -= 1
              case 'a' | 'A' if depth == 1 &&
                  out.regionMatches(true, i, "as", 0, 2) &&
                  !Character.isLetterOrDigit(out.charAt(i - 1)) &&
                  out.charAt(i - 1) != '_' &&
                  i + 2 < out.length &&
                  !Character.isLetterOrDigit(out.charAt(i + 2)) &&
                  out.charAt(i + 2) != '_' =>
                lastTopAs = i
              case _ => ()
            }
            i += 1
          }
          if (depth != 0) return if (changed) Some(out) else None
          val close = i - 1
          if (lastTopAs < 0) { search = open + 1 }
          else out.substring(lastTopAs + 2, close) match {
            case Tail(tpe, fmtLit) =>
              val expr = out.substring(open + 1, lastTopAs).trim
              val castStart = search + m.start
              out = out.substring(0, castStart) +
                s"cast_format($expr, '${tpe.replaceAll("\\s+", "")}', " +
                s"$fmtLit)" + out.substring(close + 1)
              changed = true
              search = 0 // rescan from the top (indexes shifted)
            case _ => search = open + 1
          }
      }
    }
    if (changed) Some(out) else None
  }

  /** Query-results caching (Hive's QueryResultsCache analog, see
    * [[graft.plans.ResultsCache]]): opt-in per session via
    * `spark.graft.resultsCache.dir`. Commands pass through — only
    * row-producing deterministic queries are cacheable.
    */
  private def maybeCacheResult(spark: SparkSession, df: DataFrame): DataFrame =
    spark.conf.getOption("spark.graft.resultsCache.dir") match {
      case Some(dir) if !df.queryExecution.analyzed
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Command] =>
        graft.plans.ResultsCache.cachedOrRun(spark, df, dir)._1
      case _ => df
    }
}
