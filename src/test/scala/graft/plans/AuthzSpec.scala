package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import graft.{Engine, SparkSpec}

/** Authorization: GRANT/REVOKE privileges, roles, row filters, column
  * masks, and their SQL verbs — enforced at the Engine.sql front door.
  */
class AuthzSpec extends SparkSpec with BeforeAndAfterEach {

  private def sql(q: String) = Engine.sql(spark, sfDir, q)

  override def beforeEach(): Unit = { reset(); super.beforeEach() }
  override def afterEach(): Unit = { reset(); super.afterEach() }
  private def reset(): Unit = {
    Authz.clearAll()
    spark.conf.unset("spark.graft.authz.enabled")
    spark.conf.unset("spark.graft.user")
    spark.conf.unset("spark.graft.authz.admins")
  }

  private def asUser(user: String): Unit = {
    spark.conf.set("spark.graft.authz.enabled", "true")
    spark.conf.set("spark.graft.user", user)
  }

  /** Become the admin user with enforcement on: mutating admin verbs
    * (GRANT/REVOKE/roles/policies) are admin-gated once enabled.
    */
  private def asAdmin(): Unit = {
    spark.conf.set("spark.graft.authz.enabled", "true")
    spark.conf.set("spark.graft.authz.admins", "admin")
    spark.conf.set("spark.graft.user", "admin")
  }

  private def scratchTable(prefix: String, n: Int): String = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory(prefix).toString + "/t"
    (0 until n).map(i => (i.toLong, s"name$i", i % 4)).toDF("id", "name", "k")
      .write.parquet(path)
    val name = prefix + "tab"
    NamedTables.registerPath(name, path)
    name
  }

  test("deny-by-default when enabled; GRANT SELECT opens the table; REVOKE closes it") {
    asUser("alice")
    val denied = intercept[Authz.AccessDenied] {
      sql("SELECT count(*) FROM customer").collect()
    }
    assert(denied.getMessage.contains("alice"))
    asAdmin()
    sql("GRANT SELECT ON TABLE customer TO USER alice")
    asUser("alice")
    assert(sql("SELECT count(*) AS n FROM customer").head.getLong(0) > 0)
    asAdmin()
    sql("REVOKE SELECT ON TABLE customer FROM USER alice")
    asUser("alice")
    intercept[Authz.AccessDenied] { sql("SELECT count(*) FROM customer").collect() }
  }

  test("admin verbs are themselves gated: no self-grant, no policy-drop by non-admins") {
    val t = scratchTable("authz_gate_", 10)
    sql(s"ALTER TABLE $t SET ROW FILTER 'id < 3' FOR ALL") // permissive: not enabled yet
    asUser("zoe")
    // a denied user can neither grant themselves access ...
    val g = intercept[Authz.AccessDenied] {
      sql(s"GRANT SELECT ON TABLE $t TO USER zoe")
    }
    assert(g.getMessage.contains("admin"))
    // ... nor drop the filter protecting the table, nor mint roles
    intercept[Authz.AccessDenied] { sql(s"ALTER TABLE $t DROP ROW FILTER FOR ALL") }
    intercept[Authz.AccessDenied] { sql("CREATE ROLE sneaky") }
    intercept[Authz.AccessDenied] { sql("GRANT ROLE sneaky TO USER zoe") }
    assert(Authz.roles.isEmpty)
    assert(Authz.grantsOn(t).isEmpty)
    // admins administer; the filter applies to the now-granted user
    asAdmin()
    sql(s"GRANT SELECT ON TABLE $t TO USER zoe")
    asUser("zoe")
    assert(sql(s"SELECT count(*) AS n FROM $t").head.getLong(0) === 3)
  }

  test("restricted security confs cannot be SET through the SQL front door") {
    asUser("mal")
    intercept[Authz.AccessDenied] { sql("SET spark.graft.user=admin") }
    intercept[Authz.AccessDenied] { sql("SET spark.graft.authz.enabled=false") }
    intercept[Authz.AccessDenied] { sql("SET spark.graft.authz.admins=mal") }
    // RESET is SET's evil twin: unsetting the enforcement conf (or wiping
    // the whole session conf) would disable authz just as effectively
    intercept[Authz.AccessDenied] { sql("RESET spark.graft.authz.enabled") }
    intercept[Authz.AccessDenied] { sql("RESET spark.graft.user") }
    intercept[Authz.AccessDenied] { sql("RESET") }
    // the catalog dir selects the durable authz database — redirecting it
    // would bootstrap an attacker-prepared grant set
    intercept[Authz.AccessDenied] { sql("SET spark.graft.catalog=/tmp/evil") }
    // comment/whitespace-obfuscated forms defeat the pre-parse regex, so
    // the PARSED-command guard (or Spark's own raw-text SET/RESET lexing)
    // must stop them — the invariant is that none of these can ever
    // succeed in altering the security context
    Seq(
      "RESET -- nothing to see",
      "/* hi */ RESET",
      "/* hi */ RESET spark.graft.authz.enabled",
      "RESET\n\t spark.graft.authz.enabled",
      "SET /* sneaky */ spark.graft.user = admin",
      "/* x */ SET spark.graft.user = admin").foreach { stmt =>
      val denied =
        try { sql(stmt); false }
        catch { case _: Exception => true }
      assert(denied, s"obfuscated statement succeeded: $stmt")
      assert(Authz.enabled(spark) && Authz.currentUser(spark) === "mal",
        s"security context changed by: $stmt")
    }
    // the security context is unchanged
    assert(Authz.currentUser(spark) === "mal")
    assert(Authz.enabled(spark))
    // value-less SET <key> is a READ (Spark prints the value) — allowed
    sql("SET spark.graft.user")
    // admins may manage the context; unrelated confs stay settable by anyone
    asAdmin()
    sql("SET spark.graft.authz.admins=admin,ops")
    assert(spark.conf.get("spark.graft.authz.admins") === "admin,ops")
    asUser("mal")
    sql("SET spark.sql.shuffle.partitions=32")
  }

  test("disabled sessions are permissive and policies stay dormant") {
    Authz.setRowFilter("customer", Authz.AllUsers, "c_custkey < 0")
    // not enabled: no filter applies, no grant required
    assert(sql("SELECT count(*) AS n FROM customer").head.getLong(0) > 0)
  }

  test("PUBLIC is the everyone-principal (Hive's spelling of ALL)") {
    asAdmin()
    sql("GRANT SELECT ON TABLE region TO PUBLIC")
    asUser("quinn")
    assert(sql("SELECT count(*) AS n FROM region").head.getLong(0) === 5)
    asAdmin()
    sql("REVOKE SELECT ON TABLE region FROM PUBLIC")
    asUser("quinn")
    intercept[Authz.AccessDenied] { sql("SELECT count(*) FROM region").collect() }
  }

  test("roles bundle privileges; SHOW CURRENT ROLES reflects membership") {
    asAdmin()
    sql("CREATE ROLE analyst")
    sql("GRANT ROLE analyst TO USER bob")
    sql("GRANT SELECT ON TABLE nation TO ROLE analyst")
    asUser("bob")
    assert(sql("SELECT count(*) AS n FROM nation").head.getLong(0) === 25)
    val cur = sql("SHOW CURRENT ROLES").collect().map(_.getString(0))
    assert(cur.toSeq === Seq("analyst"))
    asAdmin()
    sql("REVOKE ROLE analyst FROM USER bob")
    asUser("bob")
    intercept[Authz.AccessDenied] { sql("SELECT count(*) FROM nation").collect() }
  }

  test("admins bypass checks and policies") {
    asUser("root")
    spark.conf.set("spark.graft.authz.admins", "root,ops")
    Authz.setRowFilter("nation", Authz.AllUsers, "n_nationkey < 0")
    assert(sql("SELECT count(*) AS n FROM nation").head.getLong(0) === 25)
  }

  test("row filters restrict per principal; unfiltered principals see all rows") {
    val t = scratchTable("authz_rf_", 40)
    sql(s"GRANT SELECT ON TABLE $t TO ALL")
    sql(s"ALTER TABLE $t SET ROW FILTER 'k = 0' FOR USER carol")
    asUser("carol")
    assert(sql(s"SELECT count(*) AS n FROM $t").head.getLong(0) === 10)
    asUser("dave")
    assert(sql(s"SELECT count(*) AS n FROM $t").head.getLong(0) === 40)
  }

  test("applicable filters AND together (user + role + all)") {
    val t = scratchTable("authz_and_", 40)
    sql(s"GRANT SELECT ON TABLE $t TO ALL")
    sql("CREATE ROLE readers")
    sql("GRANT ROLE readers TO USER erin")
    sql(s"ALTER TABLE $t SET ROW FILTER 'id < 20' FOR USER erin")
    sql(s"ALTER TABLE $t SET ROW FILTER 'k = 1' FOR ROLE readers")
    asUser("erin")
    // id < 20 AND k = 1 -> ids 1,5,9,13,17
    assert(sql(s"SELECT count(*) AS n FROM $t").head.getLong(0) === 5)
  }

  test("column masks transform values, keep the schema, and pick the most specific principal") {
    val t = scratchTable("authz_cm_", 8)
    sql(s"GRANT SELECT ON TABLE $t TO ALL")
    sql(s"ALTER TABLE $t SET COLUMN MASK name AS 'md5(name)' FOR ALL")
    sql(s"ALTER TABLE $t SET COLUMN MASK name AS '''[redacted]''' FOR USER frank")
    asUser("gina")
    val forAll = sql(s"SELECT name FROM $t WHERE id = 1").head.getString(0)
    assert(forAll === org.apache.commons.codec.digest.DigestUtils.md5Hex("name1"))
    asUser("frank")
    val forFrank = sql(s"SELECT name FROM $t WHERE id = 1").head.getString(0)
    assert(forFrank === "[redacted]")
    // schema is unchanged: same columns, same types
    assert(sql(s"SELECT * FROM $t").schema.map(f => f.name -> f.dataType) ===
      spark.read.parquet(NamedTables.get(t).get.root)
        .schema.map(f => f.name -> f.dataType))
  }

  test("row filters evaluate over unmasked values (filter before mask)") {
    val t = scratchTable("authz_fm_", 10)
    sql(s"GRANT SELECT ON TABLE $t TO ALL")
    sql(s"ALTER TABLE $t SET ROW FILTER 'name = ''name3''' FOR USER henry")
    sql(s"ALTER TABLE $t SET COLUMN MASK name AS '''x''' FOR USER henry")
    asUser("henry")
    val rows = sql(s"SELECT id, name FROM $t").collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === 3)   // selected by the REAL name value
    assert(rows.head.getString(1) === "x") // but served masked
  }

  test("DML verbs require their own privilege") {
    val t = scratchTable("authz_dml_", 20)
    sql(s"GRANT SELECT ON TABLE $t TO USER ivy")
    asUser("ivy")
    val denied = intercept[Authz.AccessDenied] {
      sql(s"DELETE FROM $t WHERE id >= 10")
    }
    assert(denied.getMessage.contains("delete"))
    asAdmin()
    sql(s"GRANT DELETE ON TABLE $t TO USER ivy")
    asUser("ivy")
    sql(s"DELETE FROM $t WHERE id >= 10")
    assert(sql(s"SELECT count(*) AS n FROM $t").head.getLong(0) === 10)
    // UPDATE still denied: delete grant does not imply it
    intercept[Authz.AccessDenied] { sql(s"UPDATE $t SET k = 0 WHERE id = 1") }
  }

  test("SHOW GRANT lists principals and privileges; DROP verbs remove policies") {
    val t = scratchTable("authz_show_", 10)
    sql(s"GRANT SELECT, DELETE ON TABLE $t TO USER jo")
    val g = sql(s"SHOW GRANT ON TABLE $t").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(g === Set("user:jo" -> "select", "user:jo" -> "delete"))
    sql(s"ALTER TABLE $t SET ROW FILTER 'id < 5' FOR USER jo")
    asUser("jo")
    assert(sql(s"SELECT count(*) AS n FROM $t").head.getLong(0) === 5)
    asAdmin()
    sql(s"ALTER TABLE $t DROP ROW FILTER FOR USER jo")
    asUser("jo")
    assert(sql(s"SELECT count(*) AS n FROM $t").head.getLong(0) === 10)
  }

  test("maintenance verbs are not a side door: MV/EXPLAIN/RESTORE/REPLICATE enforce") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("authz_maint_").toString + "/t"
    Snapshots.create(spark, root,
      (0 until 20).map(i => (i.toLong, s"c${i % 4}")).toDF("id", "cat"))
    NamedTables.registerSnapshot("authz_maint", root)
    try {
      asUser("moe")
      // CREATE MV would materialize an ungranted table — denied by the
      // query's own SELECT check
      intercept[Authz.AccessDenied] {
        sql("CREATE MATERIALIZED VIEW mv_moe LOCATION '/tmp/mv_moe' AS " +
          "SELECT cat, count(*) AS n FROM authz_maint GROUP BY cat")
      }
      // EXPLAIN ANALYZE executes: denied the same way
      intercept[Authz.AccessDenied] {
        sql("EXPLAIN ANALYZE SELECT count(*) FROM authz_maint") }
      intercept[Authz.AccessDenied] {
        sql("EXPLAIN CBO SELECT count(*) FROM authz_maint") }
      // state-rewriting verbs need UPDATE, not nothing
      intercept[Authz.AccessDenied] {
        sql("RESTORE TABLE authz_maint TO VERSION AS OF 0") }
      intercept[Authz.AccessDenied] { sql("OPTIMIZE authz_maint") }
      intercept[Authz.AccessDenied] { sql("VACUUM authz_maint RETAIN 0 HOURS") }
      // raw-file replication is admin-only (policies cannot follow files)
      intercept[Authz.AccessDenied] {
        sql("REPLICATE TABLE authz_maint TO '/tmp/authz_maint_copy'") }
      // a GRANTED but row-FILTERED user cannot materialize the shared MV
      asAdmin()
      sql("GRANT SELECT ON TABLE authz_maint TO USER moe")
      sql("ALTER TABLE authz_maint SET ROW FILTER 'cat = ''c1''' FOR USER moe")
      asUser("moe")
      val e = intercept[Authz.AccessDenied] {
        sql("CREATE MATERIALIZED VIEW mv_moe LOCATION '/tmp/mv_moe' AS " +
          "SELECT cat, count(*) AS n FROM authz_maint GROUP BY cat")
      }
      assert(e.getMessage.contains("shared by all users"))
      // ... but EXPLAIN ANALYZE now runs THEIR policied view (5 rows of c1)
      val analyzed = sql("EXPLAIN ANALYZE SELECT id FROM authz_maint")
        .collect().map(_.getString(0)).mkString("\n")
      assert(analyzed.contains("numOutputRows=5"),
        s"EXPLAIN ANALYZE must measure the invoker's filtered view:\n$analyzed")
      // UPDATE privilege opens the state-rewriting verbs
      asAdmin()
      sql("GRANT UPDATE ON TABLE authz_maint TO USER moe")
      asUser("moe")
      sql("OPTIMIZE authz_maint")
      // embedded statements get the SAME guards: a command smuggled into
      // EXPLAIN ANALYZE / CREATE MV cannot touch the security context
      intercept[Authz.AccessDenied] {
        sql("EXPLAIN ANALYZE SET spark.graft.user=admin") }
      intercept[Authz.AccessDenied] { sql("EXPLAIN ANALYZE RESET") }
      intercept[Exception] {
        sql("CREATE MATERIALIZED VIEW mv_cmd LOCATION '/tmp/mv_cmd' AS " +
          "SET spark.graft.authz.enabled=false") }
      assert(Authz.enabled(spark) && Authz.currentUser(spark) === "moe",
        "an embedded command altered the security context")
      // EXPLAIN DEPENDENCY requires the query's privileges too
      intercept[Authz.AccessDenied] {
        sql("EXPLAIN DEPENDENCY SELECT * FROM region") }
    } finally NamedTables.drop("authz_maint")
  }

  test("CTE aliases are statement-local: no grant required, and they shadow policies") {
    asAdmin()
    sql("GRANT SELECT ON TABLE nation TO USER noa")
    asUser("noa")
    // the CTE name needs no grant of its own
    val n = sql(
      """WITH tiny AS (SELECT n_nationkey FROM nation WHERE n_nationkey < 3)
        |SELECT count(*) AS n FROM tiny""".stripMargin).head.getLong(0)
    assert(n === 3)
    // a CTE named like a policied table shadows it (analyzer precedence):
    // the policy must NOT rewrite the alias
    Authz.setRowFilter("nation", Authz.AllUsers, "n_nationkey < 0")
    val shadowed = sql(
      """WITH nation AS (SELECT 1 AS one)
        |SELECT count(*) AS n FROM nation""".stripMargin).head.getLong(0)
    assert(shadowed === 1)
    // while a direct read of the real table still gets the filter
    assert(sql("SELECT count(*) AS n FROM nation").head.getLong(0) === 0)
  }

  test("CTE scope is positional: a nested CTE alias exempts nothing outside its scope") {
    val t = scratchTable("authz_ctescope_", 20)
    asUser("oli")
    // a CTE named like the protected table, nested inside one branch, must
    // not exempt the OUTER reference to the real table from the check
    intercept[Authz.AccessDenied] {
      sql(
        s"""SELECT id FROM $t
           |UNION ALL
           |SELECT c FROM (WITH $t AS (SELECT 1 AS c) SELECT c FROM $t)"""
          .stripMargin).collect()
    }
    // ... nor from the policy rewrite once SELECT is granted
    asAdmin()
    sql(s"GRANT SELECT ON TABLE $t TO USER oli")
    sql(s"ALTER TABLE $t SET ROW FILTER 'id < 2' FOR USER oli")
    asUser("oli")
    val n = sql(
      s"""SELECT count(*) AS n FROM (
         |  SELECT id FROM $t
         |  UNION ALL
         |  SELECT c FROM (WITH $t AS (SELECT 1 AS c) SELECT c FROM $t))"""
        .stripMargin).head.getLong(0)
    assert(n === 3, "outer read must be filtered (2 rows) + 1 CTE row")
  }

  test("reads INSIDE a CTE definition are checked and policied") {
    val t = scratchTable("authz_ctedef_", 20)
    asUser("uma")
    // the read of the real table lives inside the CTE definition — it must
    // still require SELECT (cteRelations are not plan children; a naive
    // traversal never sees this read)
    intercept[Authz.AccessDenied] {
      sql(s"WITH x AS (SELECT id FROM $t) SELECT count(*) FROM x").collect()
    }
    asAdmin()
    sql(s"GRANT SELECT ON TABLE $t TO USER uma")
    sql(s"ALTER TABLE $t SET ROW FILTER 'id < 5' FOR USER uma")
    sql(s"ALTER TABLE $t SET COLUMN MASK name AS '''[hidden]''' FOR USER uma")
    asUser("uma")
    // filter applies through the CTE definition
    assert(sql(s"WITH x AS (SELECT id FROM $t) SELECT count(*) AS n FROM x")
      .head.getLong(0) === 5)
    // mask applies through the CTE definition
    val names = sql(s"WITH x AS (SELECT name FROM $t) SELECT name FROM x")
      .collect().map(_.getString(0))
    assert(names.length === 5 && names.forall(_ === "[hidden]"),
      s"masked values must flow through the CTE definition: ${names.toSeq}")
    // and through subquery-expression plans referencing a CTE body
    assert(sql(
      s"""SELECT count(*) AS n FROM (SELECT 1)
         |WHERE EXISTS (WITH y AS (SELECT id FROM $t WHERE id >= 5)
         |              SELECT * FROM y)""".stripMargin).head.getLong(0) === 0,
      "row filter must apply inside an EXISTS subquery's CTE definition")
  }

  test("SET ROLE without authz enabled falls through to Spark's own error") {
    // no enforcement: the verb is not intercepted — the session gets
    // Spark's canonical SET ROLE rejection, not a confusing
    // "user anonymous has not been granted role x" from a subsystem it
    // never opted into
    val e = intercept[Exception] { Engine.sql(spark, sfDir, "SET ROLE anything") }
    assert(!e.isInstanceOf[IllegalArgumentException] &&
      !e.getMessage.contains("has not been granted"),
      s"authz intercepted SET ROLE while disabled: $e")
    assert(!Authz.enabled(spark))
  }

  test("SET ROLE issued BEFORE enforcement updates the active-role selection") {
    // bootstrap scripts grant roles and narrow SET ROLE while enforcement
    // is still off, THEN flip it on — the pre-enforcement SET ROLE must
    // not silently degrade to a Spark no-op (any authz state activates
    // the verb; only a virgin session falls through)
    sql("CREATE ROLE boot_r")
    sql("CREATE ROLE boot_other")
    sql("GRANT ROLE boot_r TO USER kai")
    sql("GRANT ROLE boot_other TO USER kai")
    sql("GRANT SELECT ON TABLE region TO ROLE boot_r")
    spark.conf.set("spark.graft.user", "kai")
    sql("SET ROLE boot_other") // enforcement still OFF
    spark.conf.set("spark.graft.authz.enabled", "true")
    // the pre-enforcement narrowing is live: boot_r's grant is inactive
    intercept[Authz.AccessDenied] { sql("SELECT count(*) FROM region").collect() }
    assert(sql("SHOW CURRENT ROLES").collect().map(_.getString(0)).toSeq ===
      Seq("boot_other"))
    sql("SET ROLE ALL")
    assert(sql("SELECT count(*) AS n FROM region").head.getLong(0) === 5)
  }

  test("row-filter predicates push down to the scan (policy cost = user WHERE)") {
    val t = scratchTable("authz_push_", 100)
    sql(s"GRANT SELECT ON TABLE $t TO ALL")
    sql(s"ALTER TABLE $t SET ROW FILTER 'id < 7' FOR ALL")
    asUser("mallory")
    val plan = sql(s"SELECT name FROM $t").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), LessThan(id,7)]"),
      s"policy filter must reach the parquet scan:\n$plan")
  }

  test("authz database persists across JVM restarts via spark.graft.catalog") {
    val dir = java.nio.file.Files.createTempDirectory("authz_store_").toString
    spark.conf.set(NamedTables.CatalogConfKey, dir)
    try {
      Authz.bootstrap(spark)
      sql("CREATE ROLE durable_r")
      sql("GRANT ROLE durable_r TO USER pat")
      sql("GRANT SELECT ON TABLE region TO ROLE durable_r")
      sql("ALTER TABLE region SET ROW FILTER 'r_regionkey < 2' FOR ROLE durable_r")
      // simulated JVM restart: memory forgotten, store detached
      Authz.clearAll()
      assert(Authz.roles.isEmpty)
      Authz.bootstrap(spark) // fresh boot reloads the durable database
      assert(Authz.roles === Seq("durable_r"))
      asUser("pat")
      assert(sql("SELECT count(*) AS n FROM region").head.getLong(0) === 2)
      val g = sql("SHOW GRANT ON TABLE region").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(g === Set("role:durable_r" -> "select"))
    } finally {
      spark.conf.unset(NamedTables.CatalogConfKey)
      NamedTables.resetForTest()
    }
  }

  test("SET ROLE narrows active roles; ALL restores, NONE deactivates") {
    asAdmin()
    sql("CREATE ROLE r_read")
    sql("CREATE ROLE r_other")
    sql("GRANT ROLE r_read TO USER lee")
    sql("GRANT ROLE r_other TO USER lee")
    sql("GRANT SELECT ON TABLE region TO ROLE r_read")
    asUser("lee")
    assert(sql("SELECT count(*) AS n FROM region").head.getLong(0) === 5)
    sql("SET ROLE r_other") // active roles exclude r_read now
    intercept[Authz.AccessDenied] { sql("SELECT count(*) FROM region").collect() }
    assert(sql("SHOW CURRENT ROLES").collect().map(_.getString(0)).toSeq ===
      Seq("r_other"))
    sql("SET ROLE ALL")
    assert(sql("SELECT count(*) AS n FROM region").head.getLong(0) === 5)
    sql("SET ROLE NONE")
    intercept[Authz.AccessDenied] { sql("SELECT count(*) FROM region").collect() }
    // a role the user was never granted is rejected
    intercept[IllegalArgumentException] { sql("SET ROLE r_secret") }
  }

  test("INSERT INTO t SELECT FROM t still requires SELECT on t") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("authz_selfins_").toString + "/t"
    Snapshots.create(spark, root, (0 until 5).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    NamedTables.registerSnapshot("authz_selfins", root)
    sql("GRANT INSERT ON TABLE authz_selfins TO USER wes")
    asUser("wes")
    // pure VALUES insert: INSERT privilege suffices
    sql("INSERT INTO authz_selfins VALUES (100, 'x')")
    // but reading the table back — even as the insert source — needs SELECT
    val denied = intercept[Authz.AccessDenied] {
      sql("INSERT INTO authz_selfins SELECT id + 200, v FROM authz_selfins")
    }
    assert(denied.getMessage.contains("select"))
    asAdmin()
    sql("GRANT SELECT ON TABLE authz_selfins TO USER wes")
    asUser("wes")
    sql("INSERT INTO authz_selfins SELECT id + 200, v FROM authz_selfins WHERE id < 2")
    assert(sql("SELECT count(*) AS n FROM authz_selfins").head.getLong(0) === 8)
  }

  test("DML sources are policied: INSERT ... SELECT cannot exfiltrate masked values") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("authz_exfil_").toString + "/t"
    Snapshots.create(spark, root, Seq.empty[(Long, String)].toDF("id", "secret"))
    NamedTables.registerSnapshot("authz_mine", root)
    val src = scratchTable("authz_exfil_src_", 10)
    sql(s"GRANT SELECT ON TABLE $src TO USER eve")
    sql("GRANT ALL ON TABLE authz_mine TO USER eve")
    sql(s"ALTER TABLE $src SET COLUMN MASK name AS '''[masked]''' FOR USER eve")
    asUser("eve")
    sql(s"INSERT INTO authz_mine SELECT id, name AS secret FROM $src WHERE id < 3")
    // read back as admin: only masked values may have landed
    spark.conf.set("spark.graft.authz.admins", "root")
    spark.conf.set("spark.graft.user", "root")
    val landed = sql("SELECT secret FROM authz_mine").collect().map(_.getString(0))
    assert(landed.length === 3)
    assert(landed.forall(_ === "[masked]"),
      s"raw values escaped through INSERT..SELECT: ${landed.toSeq}")
    // MERGE sources are wrapped the same way
    spark.conf.set("spark.graft.user", "eve")
    spark.conf.unset("spark.graft.authz.admins")
    sql(s"""MERGE INTO authz_mine t USING
           |  (SELECT id + 100 AS id, name FROM $src WHERE id < 2) s
           |ON t.id = s.id
           |WHEN NOT MATCHED THEN INSERT (id, secret) VALUES (s.id, s.name)"""
      .stripMargin)
    spark.conf.set("spark.graft.authz.admins", "root")
    spark.conf.set("spark.graft.user", "root")
    val merged = sql("SELECT secret FROM authz_mine WHERE id >= 100")
      .collect().map(_.getString(0))
    assert(merged.length === 2)
    assert(merged.forall(_ === "[masked]"))
  }

  test("path-addressed reads and snapshot TVFs enforce the owning table's governance") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("authz_path_").toString + "/t"
    Snapshots.create(spark, root,
      (0 until 20).map(i => (i.toLong, s"c${i % 4}")).toDF("id", "cat"))
    NamedTables.registerSnapshot("authz_gov", root)
    sql("ALTER TABLE authz_gov SET ROW FILTER 'cat = ''c1''' FOR ALL")
    asUser("pia")
    // no grant anywhere: name, path, and TVF forms all deny
    intercept[Authz.AccessDenied] { sql("SELECT count(*) FROM authz_gov").collect() }
    intercept[Authz.AccessDenied] {
      sql(s"SELECT count(*) FROM snapshot.`$root`").collect() }
    intercept[Authz.AccessDenied] {
      sql(s"SELECT count(*) FROM snapshot_table('$root')").collect() }
    // one grant on the NAME governs every address of the same data
    asAdmin()
    sql("GRANT SELECT ON TABLE authz_gov TO USER pia")
    asUser("pia")
    assert(sql("SELECT count(*) AS n FROM authz_gov").head.getLong(0) === 5)
    assert(sql(s"SELECT count(*) AS n FROM snapshot.`$root`").head.getLong(0) === 5,
      "path address must apply the owning table's row filter")
    assert(sql(s"SELECT count(*) AS n FROM snapshot_table('$root')")
      .head.getLong(0) === 5, "TVF address must apply the row filter")
    // an unregistered path stays deny-by-default (no side door)
    val loose = java.nio.file.Files.createTempDirectory("authz_loose_").toString + "/p"
    (0 until 3).map(i => (i, i)).toDF("a", "b").write.parquet(loose)
    intercept[Authz.AccessDenied] {
      sql(s"SELECT count(*) FROM parquet.`$loose`").collect() }
  }

  test("hive_acid TVF is path-governed: deny-by-default, owning name's " +
      "grants and row filter apply") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("authz_acid_")
      .toString + "/t"
    graft.sources.AcidOrc.appendDelta(spark, dir, 5L,
      (0 until 20).map(i => (i.toLong, s"c${i % 4}")).toDF("id", "cat"))
    graft.plans.SnapshotSql.register(spark)
    // unregistered acid dir: deny-by-default, no raw-file side door
    asUser("pia")
    intercept[Authz.AccessDenied] {
      sql(s"SELECT count(*) FROM hive_acid('$dir')").collect() }
    // registered under a name: the name's grant + row filter govern the TVF
    asAdmin()
    NamedTables.registerPath("authz_acid", dir)
    sql("ALTER TABLE authz_acid SET ROW FILTER 'cat = ''c1''' FOR ALL")
    asUser("pia")
    intercept[Authz.AccessDenied] {
      sql(s"SELECT count(*) FROM hive_acid('$dir')").collect() }
    asAdmin()
    sql("GRANT SELECT ON TABLE authz_acid TO USER pia")
    asUser("pia")
    assert(sql(s"SELECT count(*) AS n FROM hive_acid('$dir')")
      .head.getLong(0) === 5,
      "hive_acid must apply the owning table's row filter")
  }

  test("randomized policy net: front-door reads equal the direct DataFrame model") {
    // seeded random (filter, mask, principal) combinations; the SQL path
    // (substitution + analyzer + SubqueryAlias) must equal a hand-built
    // DataFrame applying the DECLARED semantics: applicable filters AND
    // (user + member roles + ALL), one mask per column by most-specific
    // principal (user > role > all), filter before mask.
    import org.apache.spark.sql.DataFrame
    val t = scratchTable("authz_net_", 60)
    val root = NamedTables.get(t).get.root
    val rnd = new scala.util.Random(20260814L)
    val predPool = Seq("id < 30", "k = 1", "id % 3 = 0", "name > 'name3'")
    val maskPool = Seq( // (column, mask expr)
      "name" -> "md5(name)", "name" -> "'***'", "id" -> "id % 10", "k" -> "k + 100")
    val user = "netuser"
    for (i <- 1 to 12) {
      Authz.clearAll()
      spark.conf.set("spark.graft.authz.enabled", "true")
      spark.conf.set("spark.graft.user", user)
      Authz.grant(t, Authz.AllUsers, Seq("select"))
      Authz.createRole("net_role")
      val isMember = rnd.nextBoolean()
      if (isMember) Authz.grantRole("net_role", user)
      val principals = Seq(
        Authz.User(user), Authz.Role("net_role"), Authz.AllUsers)
      def applies(p: Authz.Principal): Boolean = p match {
        case Authz.Role(_) => isMember
        case _ => true
      }
      // declared-semantics specificity order for mask selection
      def rank(p: Authz.Principal): Int = p match {
        case Authz.User(_) => 0
        case Authz.Role(_) => 1
        case Authz.AllUsers => 2
      }
      val filters = principals.filter(_ => rnd.nextBoolean()).map { p =>
        p -> predPool(rnd.nextInt(predPool.length)) }
      val masks = maskPool.filter(_ => rnd.nextBoolean()).map { case (c, m) =>
        (principals(rnd.nextInt(3)), c, m) }
      filters.foreach { case (p, pred) => Authz.setRowFilter(t, p, pred) }
      masks.foreach { case (p, c, m) => Authz.setColumnMask(t, c, p, m) }

      val base = spark.read.parquet(root)
      val expectedF = filters.collect { case (p, pred) if applies(p) => pred }
        .foldLeft(base)((d, pred) => d.where(expr(pred)))
      // a repeated SET COLUMN MASK for the same (column, principal)
      // overwrites (set semantics) — keep the last registration, then pick
      // the most specific applicable principal per column
      val effective = masks.foldLeft(
        scala.collection.immutable.ListMap.empty[(String, String), (Authz.Principal, String, String)]) {
        case (acc, reg @ (p, c, _)) => acc + ((p.key, c) -> reg)
      }.values.toSeq
      val chosen = effective.filter(m => applies(m._1))
        .groupBy(_._2).map { case (c, ms) => c -> ms.minBy(m => rank(m._1))._3 }
      val expected: DataFrame =
        if (chosen.isEmpty) expectedF
        else expectedF.select(base.schema.map { f =>
          chosen.get(f.name)
            .map(m => expr(m).cast(f.dataType).as(f.name))
            .getOrElse(col(f.name))
        }: _*)

      val render = (df: DataFrame) =>
        df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      val got = render(sql(s"SELECT * FROM $t"))
      val want = render(expected)
      assert(got === want,
        s"case $i diverged (member=$isMember filters=$filters masks=$masks)")
    }
  }

  test("policies apply to snapshot-backed named tables and joins") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("authz_snap_").toString + "/t"
    Snapshots.create(spark, root,
      (0 until 30).map(i => (i.toLong, s"c${i % 3}")).toDF("id", "cat"))
    NamedTables.registerSnapshot("authz_snap", root)
    sql("GRANT SELECT ON TABLE authz_snap TO ALL")
    sql("ALTER TABLE authz_snap SET ROW FILTER 'cat = ''c1''' FOR ALL")
    asUser("kay")
    // joins against the filtered relation compose like any subquery
    val n = sql(
      """SELECT count(*) AS n FROM authz_snap a JOIN authz_snap b ON a.id = b.id""")
      .head.getLong(0)
    assert(n === 10)
    // time travel resolves to the requested version FIRST, then the policy
    // wraps it: v0 has 10 'c1' rows; the appended v1 adds 20 more
    Snapshots.table(spark, root).append(
      (100 until 120).map(i => (i.toLong, "c1")).toDF("id", "cat"))
    assert(sql("SELECT count(*) AS n FROM authz_snap").head.getLong(0) === 30)
    assert(sql("SELECT count(*) AS n FROM authz_snap VERSION AS OF 0")
      .head.getLong(0) === 10)
  }
}
