package graft.plans

import org.apache.spark.sql.functions._
import graft.{Engine, SparkSpec}

/** Snapshot refs — branches and tags (Hive 4's ALTER TABLE CREATE
  * BRANCH/TAG surface, ref ql/ddl/table/snapshotref/ + iceberg-handler
  * IcebergSnapshotRefExec.java): WAP lifecycle, mainline isolation,
  * fast-forward/cherry-pick, vacuum safety, SQL verbs, governance.
  */
class SnapshotRefsSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_refs_").toString + "/t"

  private def nums(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row$i")).toDF("id", "s")
  }

  test("WAP lifecycle: branch commits are invisible until fast-forward") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 100))
    t.createBranch("audit")
    t.appendToBranch("audit", nums(100, 150))
    t.appendToBranch("audit", nums(150, 160))
    // write: staged on the branch, mainline untouched
    assert(t.read().count() === 100, "branch commits leaked into mainline")
    assert(t.latest().version === 0L)
    // audit: the branch head carries everything
    assert(t.readRef("audit").count() === 160)
    // CDC / history / streams never see branch commits
    assert(t.readChanges(0L).count() === 0)
    assert(t.history().map(_.action) === Seq("create"))
    // publish: fast-forward moves the mainline to the audited head
    val m = t.fastForward("audit")
    assert(m.action === "fast-forward")
    assert(t.read().count() === 160)
    assert(t.readChanges(0L).count() === 60,
      "the fast-forward must surface the published rows as one change set")
  }

  test("tags pin immutable versions; branches reject tag writes") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 50))
    t.createTag("v1")
    t.append(nums(50, 80))
    t.createTag("v2")
    assert(t.readRef("v1").count() === 50)
    assert(t.readRef("v2").count() === 80)
    val e = intercept[IllegalArgumentException] {
      t.appendToBranch("v1", nums(0, 1)) }
    assert(e.getMessage.contains("tags are immutable"))
    // kind collisions mirror the reference's errors
    val e2 = intercept[IllegalArgumentException] { t.createBranch("v1") }
    assert(e2.getMessage.contains("exists as tag"))
    val e3 = intercept[IllegalArgumentException] { t.dropBranch("v1") }
    assert(e3.getMessage.contains("exists as tag"))
    t.dropTag("v1")
    intercept[IllegalArgumentException] { t.readRef("v1") }
    t.dropTag("v1", ifExists = true) // idempotent under IF EXISTS
  }

  test("REPLACE BRANCH/TAG repoints an existing ref; CREATE OR REPLACE " +
      "creates when absent; kind and existence guards hold") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 40)) // v0
    t.append(nums(40, 70)) // v1
    t.append(nums(70, 90)) // v2
    t.createBranch("dev", fromVersion = Some(0L))
    assert(t.readRef("dev").count() === 40)
    // repoint at v1 explicitly; then at the head by default
    t.replaceBranch("dev", Some(1L))
    assert(t.readRef("dev").count() === 70)
    t.replaceBranch("dev")
    assert(t.readRef("dev").count() === 90)
    // tags replace too
    t.createTag("rel", fromVersion = Some(0L))
    t.replaceTag("rel", Some(2L))
    assert(t.readRef("rel").count() === 90)
    // guards: missing ref refuses and points at CREATE OR REPLACE;
    // cross-kind replace refuses; nonexistent target version refuses
    val e1 = intercept[IllegalArgumentException] {
      t.replaceBranch("nope") }
    assert(e1.getMessage.contains("CREATE OR REPLACE"))
    val e2 = intercept[IllegalArgumentException] {
      t.replaceBranch("rel") }
    assert(e2.getMessage.contains("exists as tag"))
    val e3 = intercept[IllegalArgumentException] {
      t.replaceBranch("dev", Some(99L)) }
    assert(e3.getMessage.contains("does not exist"))
    // CREATE OR REPLACE creates when absent
    t.replaceBranch("hotfix", Some(1L), orCreate = true)
    assert(t.readRef("hotfix").count() === 70)
    // SQL verbs
    NamedTables.registerSnapshot("refs_rep", root)
    try {
      def sql(q: String) = Engine.sql(spark, sfDir, q)
      sql("ALTER TABLE refs_rep REPLACE BRANCH dev FOR SYSTEM_VERSION AS OF 0")
      assert(t.readRef("dev").count() === 40)
      sql("ALTER TABLE refs_rep CREATE OR REPLACE BRANCH fresh " +
        "FOR SYSTEM_VERSION AS OF 1 RETAIN 7 DAYS")
      assert(t.readRef("fresh").count() === 70)
      assert(t.refs()("fresh").maxRefAgeMs.exists(_ > 0))
      sql("ALTER TABLE refs_rep REPLACE TAG rel FOR SYSTEM_VERSION AS OF 0")
      assert(t.readRef("rel").count() === 40)
    } finally NamedTables.drop("refs_rep")
  }

  test("fast-forward refuses when the mainline advanced past the fork") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 10))
    t.createBranch("dev")
    t.appendToBranch("dev", nums(10, 20))
    t.append(nums(90, 95)) // mainline moves — fork diverged
    val e = intercept[IllegalArgumentException] { t.fastForward("dev") }
    assert(e.getMessage.contains("not an ancestor"))
    // the mainline is untouched by the refused fast-forward
    assert(t.read().count() === 15)
  }

  test("cherry-pick re-applies an append-only commit; refuses rewrites") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 10))
    t.createBranch("dev")
    val bm = t.appendToBranch("dev", nums(10, 25))
    t.append(nums(100, 105)) // mainline diverges — FF impossible
    val m = t.cherryPick(bm.version)
    assert(m.action === "cherry-pick")
    assert(t.read().count() === 30) // 10 + 5 + 15
    // a row-rewriting commit refuses
    val del = t.deleteWhere(col("id") < 5)
    val e = intercept[IllegalArgumentException] { t.cherryPick(del.version) }
    assert(e.getMessage.contains("append-only"))
  }

  test("set-current-snapshot points the mainline at any commit, even a branch's") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 10))
    t.createBranch("dev")
    val bm = t.appendToBranch("dev", nums(10, 30))
    t.setCurrentSnapshot(bm.version)
    assert(t.read().count() === 30)
    t.setCurrentSnapshot(0L) // and back
    assert(t.read().count() === 10)
  }

  test("vacuum preserves ref heads and their data files") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 10))
    t.createBranch("keepme")
    t.appendToBranch("keepme", nums(10, 40))
    t.createTag("pin") // tags version 0
    (0 until 6).foreach(i => t.append(nums(100 + i, 101 + i)))
    t.vacuum(retainLast = 1, minAgeHours = 0.0)
    // the branch and tag still read in full after an aggressive vacuum
    assert(t.readRef("keepme").count() === 40,
      "vacuum destroyed branch data")
    assert(t.readRef("pin").count() === 10, "vacuum destroyed the tag")
    assert(t.read().count() === 16)
  }

  test("concurrent branch appends serialize on the ref — none lost") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 1))
    t.createBranch("hot")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            val tt = Snapshots.table(spark, root)
            tt.appendToBranch("hot", nums(10 + i * 10, 15 + i * 10),
              maxRetries = 30)
          }
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    assert(t.readRef("hot").count() === 1 + 8 * 5,
      "a concurrent branch append was lost")
    assert(t.read().count() === 1)
  }

  test("SQL verbs: CREATE/DROP/RENAME BRANCH, TAG, EXECUTE family, branch reads") {
    import spark.implicits._
    def sql(q: String) = Engine.sql(spark, sfDir, q)
    val root = freshRoot()
    Snapshots.create(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))
    NamedTables.registerSnapshot("refs_t", root)
    try {
      sql("ALTER TABLE refs_t CREATE BRANCH wap")
      sql("ALTER TABLE refs_t CREATE TAG genesis FOR SYSTEM_VERSION AS OF 0")
      sql("ALTER TABLE refs_t CREATE BRANCH IF NOT EXISTS wap") // no-op
      // INSERT INTO the branch (Hive-Iceberg's t.branch_<name> spelling)
      sql("INSERT INTO refs_t.branch_wap VALUES (3, 'c'), (4, 'd')")
      assert(sql("SELECT count(*) AS n FROM refs_t").head.getLong(0) === 2)
      assert(sql("SELECT count(*) AS n FROM refs_t.branch_wap")
        .head.getLong(0) === 4)
      assert(sql("SELECT count(*) AS n FROM refs_t.tag_genesis")
        .head.getLong(0) === 2)
      // refs metadata listing
      val refs = sql("SELECT * FROM refs_t.refs").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(refs === Set("wap" -> "branch", "genesis" -> "tag"))
      // publish
      sql("ALTER TABLE refs_t EXECUTE FAST-FORWARD 'wap'")
      assert(sql("SELECT count(*) AS n FROM refs_t").head.getLong(0) === 4)
      // rename + drop
      sql("ALTER TABLE refs_t RENAME BRANCH wap TO shipped")
      assert(sql("SELECT count(*) AS n FROM refs_t.branch_shipped")
        .head.getLong(0) === 4)
      sql("ALTER TABLE refs_t DROP BRANCH shipped")
      sql("ALTER TABLE refs_t DROP TAG genesis")
      assert(sql("SELECT count(*) AS n FROM refs_t.refs").head.getLong(0) === 0)
      // UPDATE on a branch target commits to the branch, not the mainline
      sql("ALTER TABLE refs_t CREATE BRANCH b2")
      sql("UPDATE refs_t.branch_b2 SET tag = 'x' WHERE id = 1")
      assert(sql("SELECT tag FROM refs_t.branch_b2 WHERE id = 1")
        .head.getString(0) === "x")
      assert(sql("SELECT tag FROM refs_t WHERE id = 1")
        .head.getString(0) === "a", "branch UPDATE leaked into mainline")
    } finally {
      NamedTables.drop("refs_t")
    }
  }

  test("branch-addressed UPDATE/DELETE/MERGE: WAP corrections publish via fast-forward") {
    import spark.implicits._
    def sql(q: String) = Engine.sql(spark, sfDir, q)
    val root = freshRoot()
    val t = Snapshots.create(spark, root,
      (0 until 40).map(i => (i.toLong, s"v$i", i % 4)).toDF("id", "s", "grp"))
    NamedTables.registerSnapshot("bdml_t", root)
    try {
      sql("ALTER TABLE bdml_t CREATE BRANCH fix")
      sql("ALTER TABLE bdml_t CREATE TAG locked")

      // DELETE on the branch: branch shrinks, mainline untouched
      sql("DELETE FROM bdml_t.branch_fix WHERE grp = 3")
      assert(sql("SELECT count(*) AS n FROM bdml_t.branch_fix")
        .head.getLong(0) === 30)
      assert(sql("SELECT count(*) AS n FROM bdml_t").head.getLong(0) === 40,
        "branch DELETE leaked into mainline")

      // UPDATE on the branch reads the BRANCH head (the grp=3 rows it
      // deleted above must not resurrect or match)
      sql("UPDATE bdml_t.branch_fix SET s = concat('fixed_', id) WHERE grp = 0")
      assert(sql(
        "SELECT count(*) AS n FROM bdml_t.branch_fix WHERE s LIKE 'fixed_%'")
        .head.getLong(0) === 10)
      assert(sql("SELECT count(*) AS n FROM bdml_t WHERE s LIKE 'fixed_%'")
        .head.getLong(0) === 0, "branch UPDATE leaked into mainline")

      // MERGE into the branch: update one row, insert a fresh one
      Seq((1L, "merged", 1), (1000L, "new", 9))
        .toDF("id", "s", "grp").createOrReplaceTempView("bdml_src")
      sql("""MERGE INTO bdml_t.branch_fix AS t USING bdml_src AS s
            |ON t.id = s.id
            |WHEN MATCHED THEN UPDATE SET s = s.s
            |WHEN NOT MATCHED THEN INSERT (id, s, grp) VALUES (s.id, s.s, s.grp)
            |""".stripMargin)
      assert(sql("SELECT s FROM bdml_t.branch_fix WHERE id = 1")
        .head.getString(0) === "merged")
      assert(sql("SELECT count(*) AS n FROM bdml_t.branch_fix")
        .head.getLong(0) === 31)
      assert(sql("SELECT count(*) AS n FROM bdml_t WHERE id = 1000")
        .head.getLong(0) === 0, "branch MERGE leaked into mainline")

      // branch history records each verb; the mainline log is untouched
      assert(t.latest().version === 0L)

      // publish: the corrected state fast-forwards onto the mainline
      sql("ALTER TABLE bdml_t EXECUTE FAST-FORWARD 'fix'")
      assert(sql("SELECT count(*) AS n FROM bdml_t").head.getLong(0) === 31)
      assert(sql("SELECT s FROM bdml_t WHERE id = 1").head.getString(0)
        === "merged")
      assert(sql("SELECT count(*) AS n FROM bdml_t WHERE grp = 3")
        .head.getLong(0) === 0)

      // the pre-correction tag still reads the original 40 rows
      assert(sql("SELECT count(*) AS n FROM bdml_t.tag_locked")
        .head.getLong(0) === 40)

      // tag targets refuse every verb — tags are immutable
      for (stmt <- Seq(
          "UPDATE bdml_t.tag_locked SET s = 'x' WHERE id = 1",
          "DELETE FROM bdml_t.tag_locked WHERE id = 1",
          """MERGE INTO bdml_t.tag_locked AS t USING bdml_src AS s
            |ON t.id = s.id WHEN MATCHED THEN DELETE""".stripMargin)) {
        val e = intercept[IllegalArgumentException] { sql(stmt) }
        assert(e.getMessage.contains("tags are immutable"), stmt)
      }
    } finally {
      NamedTables.drop("bdml_t")
    }
  }

  test("branch DML serializes on the ref: concurrent updates both land") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 40))
    t.createBranch("b")
    import org.apache.spark.sql.functions.{col, lit, concat}
    val workers = (0 until 4).map { w =>
      new Thread {
        override def run(): Unit =
          t.updateWhereOnBranch("b", col("id") % 4 === w,
            Map("s" -> concat(lit(s"w${w}_"), col("s"))))
      }
    }
    workers.foreach(_.start()); workers.foreach(_.join())
    // every worker's stripe carries its prefix — no lost update
    val got = t.readRef("b")
    for (w <- 0 until 4)
      assert(got.filter(col("s").startsWith(s"w${w}_")).count() === 10,
        s"worker $w's branch update was lost")
    assert(t.read().filter(col("s").startsWith("w")).count() === 0,
      "branch updates leaked into mainline")
  }

  test("metadata tables: t.history, t.snapshots, t.files, t.partitions") {
    import spark.implicits._
    def sql(q: String) = Engine.sql(spark, sfDir, q)
    val root = freshRoot()
    val t = Snapshots.create(spark, root,
      (0 until 20).map(i => (i.toLong, s"r$i", i % 2)).toDF("id", "s", "k"),
      partitionBy = Seq("k"))
    t.append((20 until 30).map(i => (i.toLong, s"r$i", i % 2)).toDF("id", "s", "k"))
    NamedTables.registerSnapshot("meta_t", root)
    try {
      // history: one row per mainline commit, versions are the snapshot ids
      // (ref TestHiveIcebergSelects.java testHistory)
      val hist = sql("SELECT snapshot_id FROM meta_t.history")
        .collect().map(_.getLong(0)).toSeq
      assert(hist === Seq(0L, 1L))
      assert(sql("SELECT * FROM meta_t.history").columns.toSeq ===
        Seq("made_current_at", "snapshot_id", "parent_id",
          "is_current_ancestor"))
      // snapshots: operation + summary counts
      val snaps = sql(
        "SELECT snapshot_id, operation, summary['total-records'] FROM meta_t.snapshots")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(snaps.map(_._2).toSeq === Seq("create", "append"))
      assert(snaps.last._3 === "30")
      // files: every live file with its recorded rows and bytes
      val files = sql(
        "SELECT file_path, record_count, file_size_in_bytes FROM meta_t.files")
        .collect()
      assert(files.map(_.getLong(1)).sum === 30)
      assert(files.forall(_.getLong(2) > 0))
      // partitions: per-partition rollup from the manifest alone
      val parts = sql(
        "SELECT partition, record_count, file_count FROM meta_t.partitions")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(parts === Map("k=0" -> 15L, "k=1" -> 15L))
      // is_current_ancestor survives a fast-forward: the ancestor chain
      // crosses the branch commit, and every pre-fork mainline commit is
      // still an ancestor of the published head
      t.createBranch("anc")
      t.appendToBranch("anc",
        (30 until 35).map(i => (i.toLong, s"r$i", i % 2)).toDF("id", "s", "k"))
      t.fastForward("anc")
      val anc = sql(
        "SELECT snapshot_id, is_current_ancestor FROM meta_t.history")
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      assert(anc.values.forall(identity),
        s"pre-fork mainline commits must stay ancestors through the fork: $anc")
    } finally NamedTables.drop("meta_t")
  }

  test("EXECUTE ROLLBACK / EXPIRE_SNAPSHOTS / ORPHAN-FILES spellings") {
    import spark.implicits._
    def sql(q: String) = Engine.sql(spark, sfDir, q)
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 10))
    t.append(nums(10, 20))
    t.append(nums(20, 30))
    NamedTables.registerSnapshot("exec_t", root)
    try {
      // rollback by version, then by timestamp (to the rolled-back commit)
      sql("ALTER TABLE exec_t EXECUTE ROLLBACK(1)")
      assert(sql("SELECT count(*) AS n FROM exec_t").head.getLong(0) === 20)
      val ts = new java.sql.Timestamp(t.latest().timestampMs + 1).toString
      sql(s"ALTER TABLE exec_t EXECUTE ROLLBACK('$ts')")
      assert(sql("SELECT count(*) AS n FROM exec_t").head.getLong(0) === 20)
      // orphan-files with no orphans reclaims nothing and keeps history
      val before = t.history().size
      sql("ALTER TABLE exec_t EXECUTE ORPHAN-FILES OLDER THAN '1970-01-02 00:00:00'")
      assert(t.history().size === before, "orphan-files must not prune history")
      assert(sql("SELECT count(*) AS n FROM exec_t").head.getLong(0) === 20)
      // expire to the last 1 version: older versions gone, state intact
      sql("ALTER TABLE exec_t EXECUTE EXPIRE_SNAPSHOTS RETAIN LAST 1")
      assert(t.history().size === 1)
      assert(sql("SELECT count(*) AS n FROM exec_t").head.getLong(0) === 20)
    } finally NamedTables.drop("exec_t")
  }

  test("branch reads and writes govern under the owning table's authz") {
    import spark.implicits._
    def sql(q: String) = Engine.sql(spark, sfDir, q)
    val root = freshRoot()
    Snapshots.create(spark, root,
      (0 until 10).map(i => (i.toLong, s"n$i")).toDF("id", "name"))
    NamedTables.registerSnapshot("authz_refs_t", root)
    val t = Snapshots.table(spark, root)
    t.createBranch("dev")
    try {
      spark.conf.set("spark.graft.authz.enabled", "true")
      spark.conf.set("spark.graft.authz.admins", "admin")
      spark.conf.set("spark.graft.user", "admin")
      sql("GRANT SELECT ON TABLE authz_refs_t TO USER reader")
      spark.conf.set("spark.graft.user", "intruder")
      // no grant: the branch is not a side door around deny-by-default
      intercept[Authz.AccessDenied] {
        sql("SELECT * FROM authz_refs_t.branch_dev").collect() }
      // no UPDATE grant: refs DDL and branch INSERT are gated too
      intercept[Authz.AccessDenied] {
        sql("ALTER TABLE authz_refs_t CREATE BRANCH sneaky") }
      intercept[Authz.AccessDenied] {
        sql("INSERT INTO authz_refs_t.branch_dev VALUES (99, 'x')") }
      // SELECT-granted user reads the branch under the table's grant
      spark.conf.set("spark.graft.user", "reader")
      assert(sql("SELECT count(*) AS n FROM authz_refs_t.branch_dev")
        .head.getLong(0) === 10)
    } finally {
      spark.conf.unset("spark.graft.authz.enabled")
      spark.conf.unset("spark.graft.user")
      spark.conf.unset("spark.graft.authz.admins")
      Authz.clearAll()
      NamedTables.drop("authz_refs_t")
    }
  }

  test("RETAIN n DAYS: aged-out refs expire at vacuum and release their pins") {
    import spark.implicits._
    def sql(q: String) = Engine.sql(spark, sfDir, q)
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 5))
    NamedTables.registerSnapshot("retain_t", root)
    try {
      sql("ALTER TABLE retain_t CREATE BRANCH ephemeral RETAIN 1 HOURS")
      sql("ALTER TABLE retain_t CREATE TAG keeper")
      assert(t.refs()("ephemeral").maxRefAgeMs === Some(3600000L))
      // an un-aged retained ref survives vacuum
      t.vacuum(retainLast = 10, minAgeHours = 24.0)
      assert(t.refs().contains("ephemeral"))
      // recreate with an already-elapsed window: the branch's HEAD COMMIT
      // (v0, committed above) is older than 1ms — the next vacuum expires it
      t.dropBranch("ephemeral")
      t.createBranch("ephemeral", maxRefAgeMs = Some(1L))
      Thread.sleep(5)
      t.vacuum(retainLast = 10, minAgeHours = 24.0)
      assert(!t.refs().contains("ephemeral"),
        "an aged-out ref must expire at vacuum")
      assert(t.refs().contains("keeper"), "unaged refs must survive")
      // age is measured from the HEAD COMMIT, not creation: an actively
      // written branch renews itself and must NOT be destroyed under its
      // writer (the Iceberg maxRefAgeMs contract)
      t.createBranch("active", maxRefAgeMs = Some(60000L))
      t.appendToBranch("active", nums(100, 105)) // fresh head commit NOW
      t.vacuum(retainLast = 10, minAgeHours = 24.0)
      assert(t.refs().contains("active"),
        "a branch with a fresh head commit must survive its retention window")
      assert(t.readRef("active").count() === 10)
    } finally NamedTables.drop("retain_t")
  }

  test("policied users can read metadata listings (SELECT-gated, unwrapped)") {
    import spark.implicits._
    def sql(q: String) = Engine.sql(spark, sfDir, q)
    val root = freshRoot()
    Snapshots.create(spark, root,
      (0 until 10).map(i => (i.toLong, s"n$i")).toDF("id", "name"))
    NamedTables.registerSnapshot("meta_gov_t", root)
    try {
      spark.conf.set("spark.graft.authz.enabled", "true")
      spark.conf.set("spark.graft.authz.admins", "admin")
      spark.conf.set("spark.graft.user", "admin")
      sql("GRANT SELECT ON TABLE meta_gov_t TO USER analyst")
      sql("ALTER TABLE meta_gov_t SET ROW FILTER 'id < 3' FOR USER analyst")
      spark.conf.set("spark.graft.user", "analyst")
      // data read: filtered
      assert(sql("SELECT count(*) AS n FROM meta_gov_t").head.getLong(0) === 3)
      // metadata listings: readable (no data columns to filter), not an
      // AnalysisException from applying 'id < 3' to (name, type, version)
      assert(sql("SELECT count(*) AS n FROM meta_gov_t.history")
        .head.getLong(0) === 1)
      assert(sql("SELECT count(*) AS n FROM meta_gov_t.refs")
        .head.getLong(0) === 0)
      // but SELECT is still required: an unknown user is denied
      spark.conf.set("spark.graft.user", "stranger")
      intercept[Authz.AccessDenied] {
        sql("SELECT * FROM meta_gov_t.history").collect() }
    } finally {
      spark.conf.unset("spark.graft.authz.enabled")
      spark.conf.unset("spark.graft.user")
      spark.conf.unset("spark.graft.authz.admins")
      Authz.clearAll()
      NamedTables.drop("meta_gov_t")
    }
  }

  test("streaming source and replication ignore branch commits") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 5))
    t.createBranch("side")
    t.appendToBranch("side", nums(5, 50))
    t.append(nums(100, 103))
    // replication walks the mainline only
    val target = java.nio.file.Files
      .createTempDirectory("graft_refs_repl_").toString + "/t"
    val r = Replication.sync(spark, root, target)
    assert(Snapshots.table(spark, target).read().count() === 8,
      "replication copied branch commits")
    assert(r.toVersion === t.latest().version)
    // a fast-forward's data MUST replicate: the diff runs against the
    // previous MAINLINE manifest, not the branch-head parent it equals
    // (fresh branch forked from the CURRENT head so FF is legal)
    t.createBranch("pub")
    t.appendToBranch("pub", nums(200, 245))
    t.fastForward("pub")
    val r2 = Replication.sync(spark, root, target)
    assert(r2.mode === "incremental", s"expected incremental, got ${r2.mode}")
    assert(Snapshots.table(spark, target).read().count() === 53,
      "replication silently dropped the fast-forwarded rows")
    assert(Snapshots.table(spark, target).read()
      .filter(col("id") >= 200).count() === 45)
  }

  test("vacuum retention counts mainline snapshots, not raw slots") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 5))
    t.append(nums(5, 10)) // v1 mainline
    t.createBranch("busy")
    // branch commits take the raw tail — they must not consume retention
    (0 until 4).foreach(i => t.appendToBranch("busy", nums(20 + i, 21 + i)))
    t.vacuum(retainLast = 2, minAgeHours = 0.0)
    // both mainline versions survive (RETAIN LAST 2 = 2 table snapshots)
    assert(t.history().map(_.version) === Seq(0L, 1L),
      "branch commits consumed mainline retention slots")
    assert(t.read().count() === 10)
    assert(t.readRef("busy").count() === 14) // branch head pinned too
  }

  test("vacuum age-gates manifest deletion like data files") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 5))
    t.append(nums(5, 10))
    t.append(nums(10, 15)) // 3 mainline versions
    // fresh manifests are younger than the horizon: retainLast=1 must NOT
    // delete them yet — an in-flight appendToBranch's published-but-not-
    // yet-CAS'd branch manifest lives in exactly this window, and deleting
    // it would dangle the branch once the ref bump lands
    t.vacuum(retainLast = 1, minAgeHours = 24.0)
    assert(t.history().map(_.version) === Seq(0L, 1L, 2L),
      "young manifests must survive the retention horizon")
    assert(t.read().count() === 15)
    // with the horizon waived (caller asserts no writer is active) the
    // same vacuum prunes history
    t.vacuum(retainLast = 1, minAgeHours = 0.0)
    assert(t.history().map(_.version) === Seq(2L))
    assert(t.read().count() === 15)
  }

  test("ORPHAN-FILES reclaims strays only: keeps branch history, refs, aging") {
    import spark.implicits._
    def sql(q: String) = Engine.sql(spark, sfDir, q)
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 5))
    t.createBranch("wip")
    val mid = t.appendToBranch("wip", nums(5, 10)) // intermediate branch slot
    t.appendToBranch("wip", nums(10, 15)) // branch head (ref-pinned)
    t.createBranch("aged", maxRefAgeMs = Some(1L))
    Thread.sleep(5)
    // a genuinely orphan data file (no manifest references it)
    val stray = new java.io.File(root, "data/stray_orphan.parquet")
    stray.getParentFile.mkdirs()
    java.nio.file.Files.write(stray.toPath, Array[Byte](1, 2, 3))
    NamedTables.registerSnapshot("orph_t", root)
    try {
      sql("ALTER TABLE orph_t EXECUTE ORPHAN-FILES OLDER THAN " +
        s"'${new java.sql.Timestamp(System.currentTimeMillis() + 1000)}'")
      assert(!stray.exists(), "the orphan data file must be reclaimed")
      // no history pruned: the INTERMEDIATE branch manifest (not mainline,
      // not a ref head — plain vacuum would drop it) still resolves
      assert(t.resolvedManifest(mid.version).files.nonEmpty,
        "ORPHAN-FILES pruned intermediate branch history")
      // ref aging skipped: the aged-out ref survives ORPHAN-FILES...
      assert(t.refs().contains("aged"),
        "ORPHAN-FILES must not expire refs as a side effect")
      assert(t.readRef("wip").count() === 15)
      // ...and a plain vacuum (the expiry point) then does expire it and
      // drops the intermediate branch slot — proving the modes differ
      t.vacuum(retainLast = Int.MaxValue, minAgeHours = 0.0)
      assert(!t.refs().contains("aged"))
      // fresh handle: `t`'s raw-manifest cache would mask the deletion
      intercept[Exception] {
        Snapshots.table(spark, root).resolvedManifest(mid.version) }
      assert(t.readRef("wip").count() === 15,
        "the branch head must survive plain vacuum via its ref pin")
    } finally NamedTables.drop("orph_t")
  }
}
