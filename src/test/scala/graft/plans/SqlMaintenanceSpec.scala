package graft.plans

import org.apache.spark.sql.functions._
import graft.{Engine, SparkSpec}

/** Maintenance SQL verbs (RESTORE / OPTIMIZE / VACUUM) and the restore
  * primitive they lower to.
  */
class SqlMaintenanceSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_maint_").toString + "/t"

  private def nums(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row$i", i % 4)).toDF("id", "s", "k")
  }

  private def sql(q: String) = Engine.sql(spark, sfDir, q)

  test("restore rolls back data as a new commit; history stays append-only") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 100))
    t.append(nums(100, 150))
    t.deleteWhere(col("id") < 20)
    assert(t.read().count() === 130)

    val m = t.restore(0)
    assert(m.action === "restore")
    assert(m.meta("restored_version") === "0")
    assert(t.read().count() === 100, "restored state must match version 0")
    // nothing was erased: the pre-restore head is still time-travelable
    assert(t.readVersion(2).count() === 130)
    // and the restore can itself be undone by restoring forward
    t.restore(2)
    assert(t.read().count() === 130)
    // restoring to the current head is a no-op, not a new version
    val head = t.latest()
    assert(t.restore(head.version).version === head.version)
  }

  test("restore brings back the old schema across evolution") {
    import org.apache.spark.sql.types._
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 10))
    t.addColumns(StructType(Seq(StructField("extra", StringType))))
    t.renameColumn("s", "label")
    assert(t.read().columns.toSeq === Seq("id", "label", "k", "extra"))
    t.restore(0)
    val got = t.read()
    assert(got.columns.toSeq === Seq("id", "s", "k"))
    assert(got.count() === 10)
    // evolution after a restore starts from the restored schema
    t.append(nums(10, 12))
    assert(t.read().count() === 12)
  }

  test("restore to a vacuumed version fails loudly") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 10))
    t.append(nums(10, 20))
    t.append(nums(20, 30))
    t.vacuum(retainLast = 1, minAgeHours = 0)
    intercept[IllegalArgumentException](t.restore(0))
  }

  test("SQL: RESTORE TABLE ... TO VERSION AS OF / TO TIMESTAMP AS OF") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 50))
    NamedTables.registerSnapshot("maint_restore", root)
    sql("UPDATE maint_restore SET s = 'x' WHERE id < 25")
    assert(sql("SELECT count(*) AS n FROM maint_restore WHERE s = 'x'")
      .head.getLong(0) === 25)

    val res = sql("RESTORE TABLE maint_restore TO VERSION AS OF 0")
    assert(res.columns.toSeq ===
      Seq("table", "restored_version", "new_version", "n_files"))
    assert(res.head.getLong(1) === 0L)
    assert(sql("SELECT count(*) AS n FROM maint_restore WHERE s = 'x'")
      .head.getLong(0) === 0)

    // timestamp form: restore to the post-update state by its commit time
    val updTs = new java.sql.Timestamp(t.history()(1).timestampMs)
    sql(s"RESTORE TABLE maint_restore TO TIMESTAMP AS OF '$updTs'")
    assert(sql("SELECT count(*) AS n FROM maint_restore WHERE s = 'x'")
      .head.getLong(0) === 25)
  }

  test("SQL: OPTIMIZE compacts small files; ZORDER BY clusters") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 100).coalesce(1))
    (1 to 4).foreach(i => t.append(nums(i * 100, i * 100 + 100).coalesce(1)))
    NamedTables.registerSnapshot("maint_opt", root)
    val before = t.latest().files.size

    val res = sql("OPTIMIZE maint_opt")
    assert(res.head.getLong(3) === before.toLong)
    assert(res.head.getLong(4) < before.toLong, "compaction must shrink the file count")
    assert(sql("SELECT count(*) AS n FROM maint_opt").head.getLong(0) === 500)

    val z = sql("OPTIMIZE maint_opt ZORDER BY (id, k)")
    assert(z.head.getString(1) === "zorder")
    assert(sql("SELECT sum(id) AS s FROM maint_opt").head.getLong(0) ===
      (0L until 500L).sum)
  }

  test("SHOW COMPACTIONS lists reorganization commits across registered tables") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 50).coalesce(1))
    t.append(nums(50, 100).coalesce(1))
    NamedTables.registerSnapshot("maint_showc", root)
    val none = sql("SHOW COMPACTIONS")
      .filter(col("table") === "maint_showc").collect()
    assert(none.isEmpty, "no reorg commits yet")
    sql("OPTIMIZE maint_showc")
    sql("OPTIMIZE maint_showc ZORDER BY (id, k)")
    val rows = sql("SHOW COMPACTIONS")
      .filter(col("table") === "maint_showc").collect()
      .map(r => (r.getString(2), r.getString(5)))
    assert(rows.toSeq === Seq("compact" -> "succeeded", "zorder" -> "succeeded"))
  }

  test("SHOW LOCKS / SHOW TRANSACTIONS answer well-formed for the lock-free model") {
    // snapshot commits are CAS publishes: nothing ever holds a lock or an
    // open transaction between statements, so the operability verbs answer
    // zero rows with the reference's column shape
    val locks = sql("SHOW LOCKS")
    assert(locks.columns.toSeq === Seq("lockid", "database", "table",
      "partition", "lock_state", "blocked_by", "lock_type", "transaction_id",
      "last_heartbeat", "acquired_at", "user", "hostname"))
    assert(locks.count() === 0)
    // table-scoped and EXTENDED forms parse too
    assert(sql("SHOW LOCKS orders").count() === 0)
    assert(sql("SHOW LOCKS orders EXTENDED").count() === 0)
    val txns = sql("SHOW TRANSACTIONS")
    assert(txns.columns.toSeq ===
      Seq("txnid", "state", "started", "last_heartbeat", "user", "host"))
    assert(txns.count() === 0)
  }

  test("EXPLAIN AUTHORIZATION / EXPLAIN DEPENDENCY report the enforced access profile") {
    val auth = sql(
      "EXPLAIN AUTHORIZATION SELECT c_name FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey").collect()
      .map(_.getString(0))
    assert(auth.contains("INPUTS:"))
    assert(auth.contains("  customer") && auth.contains("  nation"))
    assert(auth.contains("OPERATION:") && auth.contains("  SELECT"))
    assert(auth.contains("CURRENT_USER:"))
    // a DML statement reports its target under OUTPUTS with its verb
    val dml = sql(
      "EXPLAIN AUTHORIZATION INSERT INTO customer SELECT * FROM nation")
      .collect().map(_.getString(0))
    val outIdx = dml.indexOf("OUTPUTS:")
    assert(outIdx >= 0 && dml(outIdx + 1) === "  customer")
    assert(dml.contains("  INSERT"))
    // reads inside CTE definitions are reported (same walk enforcement uses)
    val cte = sql(
      "EXPLAIN AUTHORIZATION WITH x AS (SELECT * FROM orders) " +
        "SELECT count(*) FROM x").collect().map(_.getString(0))
    assert(cte.contains("  orders") && !cte.contains("  x"))
    val dep = sql(
      "EXPLAIN DEPENDENCY SELECT * FROM lineitem JOIN part ON l_partkey = p_partkey")
      .head.getString(0)
    assert(dep.contains(""""tablename":"lineitem"""") &&
      dep.contains(""""tablename":"part""""))
    assert(dep.startsWith("""{"input_tables":["""))
  }

  test("EXPLAIN CBO / EXPLAIN VECTORIZATION map to cost and codegen reports") {
    val cbo = sql("EXPLAIN CBO SELECT count(*) FROM nation")
      .collect().map(_.getString(0)).mkString("\n")
    assert(cbo.contains("Statistics") || cbo.contains("sizeInBytes"),
      s"EXPLAIN CBO must show the cost-annotated plan:\n$cbo")
    val vec = sql("EXPLAIN VECTORIZATION SELECT n_nationkey + 1 FROM nation")
      .collect().map(_.getString(0)).mkString("\n")
    assert(vec.contains("WholeStageCodegen"),
      s"EXPLAIN VECTORIZATION must show codegen spans:\n$vec")
  }

  test("SQL: VACUUM RETAIN 0 HOURS reclaims unreferenced files") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 100).coalesce(1))
    (1 to 3).foreach(i => t.append(nums(i * 100, i * 100 + 100).coalesce(1)))
    t.compact(minInputFiles = 2)
    NamedTables.registerSnapshot("maint_vac", root)

    val res = sql("VACUUM maint_vac RETAIN 0 HOURS")
    assert(res.head.getLong(1) > 0L, "pre-compaction files must be reclaimed")
    assert(sql("SELECT count(*) AS n FROM maint_vac").head.getLong(0) === 400)
    // a second vacuum has nothing left to do
    assert(sql("VACUUM maint_vac RETAIN 0 HOURS").head.getLong(1) === 0L)
  }

  test("maintenance verbs reject unknown and non-snapshot tables") {
    intercept[IllegalArgumentException](sql("OPTIMIZE maint_no_such_table"))
    val path = freshRoot()
    nums(0, 5).write.parquet(path)
    NamedTables.registerPath("maint_plain", path)
    intercept[IllegalArgumentException](sql("VACUUM maint_plain"))
  }

  test("CREATE / SHOW / REBUILD / DROP MATERIALIZED VIEW as SQL verbs") {
    import spark.implicits._
    val data = java.nio.file.Files.createTempDirectory("graft_mvsql_").toString
    nums(0, 100).write.parquet(s"$data/t")
    NamedTables.registerPath("mvsql_src", s"$data/t")

    val created = sql(
      s"""CREATE MATERIALIZED VIEW mvsql_agg LOCATION '$data/mv' AS
         |SELECT k, count(*) AS n, sum(id) AS s FROM mvsql_src GROUP BY k""".stripMargin)
    assert(created.head.getLong(2) === 4) // 4 groups materialized

    val listed = sql("SHOW MATERIALIZED VIEWS").collect()
    assert(listed.exists(_.getString(0) == "mvsql_agg"))

    // the rewrite rule answers a matching aggregate from the MV store
    val q = spark.read.parquet(s"$data/t").groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"id").as("s"))
    val scanned = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.mkString(",")
    }
    assert(scanned.exists(_.contains("/mv")),
      s"rewrite did not target the MV store: $scanned")

    // source grows OUTSIDE the engine's DML (external write) -> REBUILD
    // re-parses the stored SQL and sees the new files
    nums(100, 120).write.mode("append").parquet(s"$data/t")
    val rebuilt = sql("ALTER MATERIALIZED VIEW mvsql_agg REBUILD")
    assert(rebuilt.head.getLong(2) === 4)
    val fresh = spark.read.parquet(s"$data/mv")
      .agg(sum($"n")).head.getLong(0)
    assert(fresh === 120, "rebuild must reflect the appended source rows")

    sql("DROP MATERIALIZED VIEW mvsql_agg")
    assert(!sql("SHOW MATERIALIZED VIEWS").collect()
      .exists(_.getString(0) == "mvsql_agg"))
    NamedTables.drop("mvsql_src")
  }

  test("ALTER TABLE SET TBLPROPERTIES switches write.mode and blooms; SHOW lists them") {
    import spark.implicits._
    val root = freshRoot()
    Snapshots.create(spark, root, nums(0, 50))
    NamedTables.registerSnapshot("maint_props", root)
    sql("ALTER TABLE maint_props SET TBLPROPERTIES ('write.mode'='merge-on-read')")
    // MOR now: a SQL DELETE must not rewrite data files
    val before = Snapshots.table(spark, root).latest().files.toSet
    sql("DELETE FROM maint_props WHERE id < 5")
    val after = Snapshots.table(spark, root).latest()
    assert(before.subsetOf(after.files.toSet), "MOR delete must keep data files")
    assert(after.deletes.nonEmpty)
    sql("ALTER TABLE maint_props SET TBLPROPERTIES " +
      "('bloom.columns'='id', 'bloom.bits'='65536')")
    val props = sql("SHOW TBLPROPERTIES maint_props").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("write.mode") === "merge-on-read")
    assert(props("bloom.columns") === "id")
    assert(props("format") === "snapshot")
    intercept[UnsupportedOperationException] {
      sql("ALTER TABLE maint_props SET TBLPROPERTIES ('nonsense'='x')")
    }
    // bloom.bits ALONE resizes the existing index (never silently ignored)
    sql("ALTER TABLE maint_props SET TBLPROPERTIES ('bloom.bits'='131072')")
    assert(Snapshots.table(spark, root).bloomConfig().get.bits === 131072L)
    NamedTables.drop("maint_props")
  }

  test("ALTER TABLE DROP PARTITION drops exactly that partition") {
    import spark.implicits._
    val root = freshRoot()
    Snapshots.create(spark, root, nums(0, 100), partitionBy = Seq("k"))
    NamedTables.registerSnapshot("maint_part", root)
    sql("ALTER TABLE maint_part DROP PARTITION (k=2)")
    val left = sql("SELECT DISTINCT k FROM maint_part").as[Int].collect().toSet
    assert(left === Set(0, 1, 3))
    assert(sql("SELECT count(*) AS n FROM maint_part").head.getLong(0) === 75)
    // absent partition: loud without IF EXISTS, silent with
    intercept[IllegalArgumentException] {
      sql("ALTER TABLE maint_part DROP PARTITION (k=9)")
    }
    sql("ALTER TABLE maint_part DROP IF EXISTS PARTITION (k=9)")
    // non-partition column refused
    intercept[IllegalArgumentException] {
      sql("ALTER TABLE maint_part DROP PARTITION (id=1)")
    }
    NamedTables.drop("maint_part")
  }

  test("DESCRIBE HISTORY returns the commit log for a registered name") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 10))
    t.append(nums(10, 20))
    NamedTables.registerSnapshot("maint_hist", root)
    val h = sql("DESCRIBE HISTORY maint_hist").collect()
    assert(h.length === 2)
    assert(h.map(_.getAs[String]("action")).toSet === Set("create", "append"))
    NamedTables.drop("maint_hist")
  }

  test("input__file__name resolves as the Hive virtual-column spelling") {
    val n = sql("SELECT input__file__name() AS f FROM lineitem")
      .distinct().count()
    assert(n >= 1)
  }

  test("EXPLAIN ANALYZE reports the executed plan with actual row counts") {
    val out = sql(
      "EXPLAIN ANALYZE SELECT o_orderstatus, count(*) FROM orders GROUP BY 1")
      .collect().map(_.getString(0))
    assert(out.exists(_.contains("HashAggregate")), out.mkString("\n"))
    // actual (not estimated) output rows appear on at least one node
    assert(out.exists(_.matches(".*numOutputRows=\\d+.*")), out.mkString("\n"))
    // and the scan reports real files read
    assert(out.exists(l => l.contains("Scan") && l.contains("numFiles=")),
      out.mkString("\n"))
  }

  test("CREATE MATERIALIZED VIEW without LOCATION lands under the warehouse dir") {
    import spark.implicits._
    val data = java.nio.file.Files.createTempDirectory("graft_mvsql_").toString
    nums(0, 10).write.parquet(s"$data/t")
    sql(s"CREATE MATERIALIZED VIEW mvsql_wh AS " +
      s"SELECT k, count(*) AS n FROM parquet.`$data/t` GROUP BY k")
    val mv = MaterializedViews.registered(spark).find(_.name == "mvsql_wh").get
    assert(mv.path.contains("graft_mv/mvsql_wh"))
    intercept[IllegalArgumentException](
      sql(s"CREATE MATERIALIZED VIEW mvsql_wh AS SELECT 1 AS one"))
    sql("DROP MATERIALIZED VIEW mvsql_wh")
  }

  test("keyword-bearing identifiers hit Spark, not the verb layer") {
    import org.apache.spark.sql.catalyst.parser.ParseException
    // a table NAMED after a verb is just an identifier to real SQL — the
    // statement parses and runs on Spark without ever reaching the verb
    // tokenizer
    nums(0, 5).createOrReplaceTempView("vacuum_log")
    assert(sql("SELECT count(*) AS n FROM vacuum_log").head.getLong(0) === 5)
    nums(0, 3).createOrReplaceTempView("optimize")
    assert(sql("SELECT count(*) AS n FROM `optimize`").head.getLong(0) === 3)
    // a verb statement with trailing junk must NOT half-match the verb —
    // it surfaces Spark's canonical parse error instead (the old per-verb
    // regexes got this right by anchoring; the tokenizer must too)
    val root = freshRoot()
    Snapshots.create(spark, root, nums(0, 10))
    NamedTables.registerSnapshot("maint_tok", root)
    try {
      intercept[ParseException](sql("VACUUM maint_tok RETAIN"))
      intercept[ParseException](sql("VACUUM maint_tok RETAIN five HOURS"))
      intercept[ParseException](sql("OPTIMIZE maint_tok SORT BY (id)"))
      intercept[ParseException](
        sql("RESTORE TABLE maint_tok TO VERSION AS OF abc"))
      intercept[ParseException](
        sql("ALTER TABLE maint_tok EXECUTE EXPIRE_SNAPSHOTS"))
      // well-formed forms still work right next to the rejected ones
      sql("VACUUM maint_tok RETAIN 1 HOURS")
      sql("OPTIMIZE maint_tok")
      // r13 verbs: malformed spellings fall through to Spark's canonical
      // error, never a half-matched verb
      intercept[ParseException](
        sql("ALTER TABLE maint_tok SET PARTITION SPEC (day(ts")) // unbalanced
      intercept[ParseException](
        sql("ALTER TABLE maint_tok SET PARTITION SPEC day(ts)")) // no parens
      intercept[ParseException](
        sql("ALTER TABLE maint_tok SET PARTITION SPEC ()")) // empty entry
      intercept[ParseException](
        sql("ALTER TABLE maint_tok SET PARTITION SPEC (not a call(x))"))
      intercept[ParseException](
        sql("ALTER TABLE maint_tok REPLACE BRANCH")) // missing name
      intercept[ParseException](
        sql("ALTER TABLE maint_tok REPLACE BRANCH b FOR SYSTEM_VERSION " +
          "AS OF abc")) // non-numeric version
      intercept[ParseException](
        sql("ALTER TABLE maint_tok CREATE OR REPLACE BRANCH b RETAIN 7"))
      // ...while ALTER TABLE t REPLACE COLUMNS stays Spark's own statement
      // (the verb layer only ever sees text Spark rejected)
      val e = intercept[Exception](
        sql("ALTER TABLE maint_tok REPLACE COLUMNS (k INT)"))
      assert(!Option(e.getMessage).exists(_.toLowerCase.contains("branch")),
        s"REPLACE COLUMNS must surface Spark's error, got: ${e.getMessage}")
    } finally NamedTables.drop("maint_tok")
  }

  test("SKEWED BY DDL: declared, described, cleared; arity and columns checked") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 20))
    NamedTables.registerSnapshot("maint_skew", root)
    try {
      // single-column form with bare scalars
      sql("ALTER TABLE maint_skew SKEWED BY (k) ON (1, 2) STORED AS DIRECTORIES")
      val s = t.skewSpec().get
      assert(s.cols === Seq("k"))
      assert(s.values === Seq(Seq("1"), Seq("2")))
      assert(s.storedAsDirectories)
      // DESCRIBE surfaces the declaration
      val desc = sql("DESCRIBE maint_skew").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(desc("Skewed Columns") === "k")
      assert(desc("Skewed Values") === "(1), (2)")
      // NOT STORED AS DIRECTORIES keeps the values, drops the flag
      sql("ALTER TABLE maint_skew NOT STORED AS DIRECTORIES")
      assert(!t.skewSpec().get.storedAsDirectories)
      // composite form with tuple groups (re-declare replaces)
      sql("ALTER TABLE maint_skew SKEWED BY (s, k) ON (('row1', 1), ('row2', 2))")
      assert(t.skewSpec().get.values === Seq(Seq("row1", "1"), Seq("row2", "2")))
      // NOT SKEWED drops everything
      sql("ALTER TABLE maint_skew NOT SKEWED")
      assert(t.skewSpec().isEmpty)
      // refusals: unknown column; value arity != column arity
      val e1 = intercept[IllegalArgumentException](
        sql("ALTER TABLE maint_skew SKEWED BY (nope) ON (1)"))
      assert(e1.getMessage.contains("nonexistent column"))
      val e2 = intercept[IllegalArgumentException](
        sql("ALTER TABLE maint_skew SKEWED BY (s, k) ON (('x'))"))
      assert(e2.getMessage.contains("arity"))
    } finally NamedTables.drop("maint_skew")
  }
}
