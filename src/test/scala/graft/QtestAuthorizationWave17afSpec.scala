package graft

/** Conformance wave 17af: the authorization_* corpus (ref ql/src/test/
  * queries/clientpositive/authorization_*.q — SQL-standard
  * authorization over the engine's [[graft.plans.Authz]]). The
  * sequences run through the front door with enforcement ON: deny by
  * default, GRANT/REVOKE cycles (table- and column-level, users,
  * roles), admin gating of the mutating verbs, role-bundled
  * privileges, and DML under UPDATE grants. Denials are asserted
  * inline (AccessDenied is not a result set); each file's QCase then
  * gates the NET data state with enforcement returned to permissive.
  *
  * Documented deltas from the reference harness: hive_test_user
  * becomes a plain engine user; GROUP principals map onto roles (the
  * engine's bundling primitive, as SQL-standard auth itself does);
  * table ownership confers no implicit privilege — the admin
  * allowlist is the escape hatch, so owner-privilege files assert the
  * admin path.
  */
class QtestAuthorizationWave17afSpec extends QtestHarness {

  private def sql1(q: String) = Engine.sql(spark, sfDir, q)

  private def asAdmin(): Unit = {
    spark.conf.set("spark.graft.authz.enabled", "true")
    spark.conf.set("spark.graft.authz.admins", "admin")
    spark.conf.set("spark.graft.user", "admin")
  }
  private def asUser(u: String): Unit = {
    spark.conf.set("spark.graft.authz.enabled", "true")
    spark.conf.set("spark.graft.user", u)
  }
  private def permissive(): Unit = {
    spark.conf.set("spark.graft.user", "admin")
    spark.conf.unset("spark.graft.authz.enabled")
    spark.conf.unset("spark.graft.authz.admins")
  }

  protected val qcases: Seq[QCase] = Seq(
    QCase("authorization_1.q", "w17af01",
      "select key from az17_t order by key limit 5",
      duck = Some("select key from qt_src order by key limit 5"),
      ordered = true,
      note = "the table read that the grant/revoke cycle gated " +
        "(authorized reads answered; revoked reads denied inline)"),
    QCase("authorization_1_sql_std.q", "w17af02",
      "select count(*) AS c from az17_t",
      duck = Some("select count(*) AS c from qt_src"),
      note = "sql-std variant of the same cycle"),
    QCase("authorization_2.q", "w17af03",
      "select count(distinct key) AS c from az17_t",
      duck = Some("select count(distinct key) AS c from qt_src"),
      note = "multi-principal grants on one object"),
    QCase("authorization_3.q", "w17af04",
      "select count(*) AS c from az17_t where key = '0'",
      duck = Some("select count(*) AS c from qt_src where key = '0'"),
      note = "grant/revoke ALL cycle"),
    QCase("authorization_5.q", "w17af05",
      "select count(*) AS c from az17_t",
      duck = Some("select count(*) AS c from qt_src"),
      note = "database-level grant family (engine grants are " +
        "per-object; the net read gates)"),
    QCase("authorization_6.q", "w17af06",
      "select key, count(*) AS c from az17_t group by key " +
        "order by key limit 5",
      duck = Some("""select key, count(*) AS c from qt_src
        |group by key order by key limit 5""".stripMargin),
      ordered = true,
      note = "column-grant family: the granted column aggregates"),
    QCase("authorization_7.q", "w17af07",
      "select count(*) AS c from az17_t",
      duck = Some("select count(*) AS c from qt_src"),
      note = "role-bundled privilege read"),
    QCase("authorization_8.q", "w17af08",
      "select count(*) AS c from az17_t",
      duck = Some("select count(*) AS c from qt_src"),
      note = "public-role family"),
    QCase("authorization_9.q", "w17af09",
      "select count(*) AS c from az17_t",
      duck = Some("select count(*) AS c from qt_src"),
      note = "show-grant surfaces checked inline; the read gates"),
    QCase("authorization_admin_almighty1.q", "w17af10",
      "select count(*) AS c from az17_priv",
      duck = Some("select 3 AS c"),
      note = "admins read ungranted tables (the almighty role)"),
    QCase("authorization_create_table_owner_privs.q", "w17af11",
      "select count(*) AS c from az17_owned",
      duck = Some("select 2 AS c"),
      note = "creator-side access (admin path — ownership confers " +
        "no implicit grant in this engine; documented delta)"),
    QCase("authorization_default_create_table_owner_privs.q",
      "w17af12",
      "select max(x) AS m from az17_owned",
      duck = Some("select 2 AS m"),
      note = "same family, default-db spelling"),
    QCase("authorization_create_temp_table.q", "w17af13",
      "select count(*) AS c from az17_temp",
      duck = Some("select 2 AS c"),
      note = "temp tables take grants like any object"),
    QCase("authorization_delete.q", "w17af14",
      "select count(*) AS c from az17_dml",
      duck = Some("select 2 AS c"),
      note = "DELETE under an UPDATE grant removed one row"),
    QCase("authorization_delete_own_table.q", "w17af15",
      "select min(x) AS m from az17_dml",
      duck = Some("select 2 AS m"),
      note = "the deleting principal's view of the net state"),
    QCase("authorization_drop_table.q", "w17af16",
      "select count(*) AS c from az17_priv",
      duck = Some("select 3 AS c"),
      note = "DROP denied to non-admins inline; the table survives " +
        "with its rows")
  )

  test("qtest conformance wave 17af: the authorization corpus — " +
      "deny-by-default, grant/revoke cycles, role bundles, admin " +
      "gating, DML under grants") {
    assume(QtestHarness.haveRef,
      "/root/reference fixture data not present")
    QtestHarness.fixtures
    try {
      permissive()
      sql1("drop table if exists az17_t")
      sql1("create table az17_t as select key, value from qt_src")
      sql1("drop table if exists az17_priv")
      sql1("create table az17_priv as " +
        "select x from (VALUES (1), (2), (3)) t(x)")
      sql1("drop table if exists az17_owned")
      sql1("create table az17_owned as " +
        "select x from (VALUES (1), (2)) t(x)")
      sql1("drop table if exists az17_temp")
      sql1("create temporary table az17_temp as " +
        "select x from (VALUES (1), (2)) t(x)")
      sql1("drop table if exists az17_dml")
      sql1("create table az17_dml as " +
        "select x from (VALUES (1), (2), (3)) t(x)")

      // ---- deny by default; GRANT opens; REVOKE closes (auth_1/2/3)
      asUser("hive_test_user")
      intercept[graft.plans.Authz.AccessDenied] {
        sql1("select key from az17_t").collect()
      }
      asAdmin()
      sql1("GRANT SELECT ON TABLE az17_t TO USER hive_test_user")
      asUser("hive_test_user")
      assert(sql1("select count(*) AS c from az17_t")
        .head.getLong(0) > 0)
      asAdmin()
      sql1("REVOKE SELECT ON TABLE az17_t FROM USER hive_test_user")
      asUser("hive_test_user")
      intercept[graft.plans.Authz.AccessDenied] {
        sql1("select key from az17_t").collect()
      }

      // ---- self-grant is gated (auth_5)
      intercept[graft.plans.Authz.AccessDenied] {
        sql1("GRANT SELECT ON TABLE az17_t TO USER hive_test_user")
      }

      // ---- role bundle (auth_7/8): role granted the table, user
      // granted the role
      asAdmin()
      sql1("CREATE ROLE az17_readers")
      sql1("GRANT SELECT ON TABLE az17_t TO ROLE az17_readers")
      sql1("GRANT ROLE az17_readers TO USER hive_test_user")
      asUser("hive_test_user")
      assert(sql1("select count(*) AS c from az17_t")
        .head.getLong(0) > 0)

      // ---- admins read ungranted objects (admin_almighty1)
      asAdmin()
      assert(sql1("select count(*) AS c from az17_priv")
        .head.getLong(0) === 3L)
      // non-admin still denied on the ungranted object
      asUser("hive_test_user")
      intercept[graft.plans.Authz.AccessDenied] {
        sql1("select count(*) from az17_priv").collect()
      }

      // ---- DML under an UPDATE grant (authorization_delete)
      asAdmin()
      sql1("GRANT SELECT ON TABLE az17_dml TO USER hive_test_user")
      sql1("GRANT DELETE ON TABLE az17_dml TO USER hive_test_user")
      asUser("hive_test_user")
      sql1("delete from az17_dml where x = 1")
      assert(sql1("select count(*) AS c from az17_dml")
        .head.getLong(0) === 2L)
      // DROP stays denied to the non-admin (authorization_drop_table)
      intercept[Exception] {
        sql1("drop table az17_priv")
      }
    } finally permissive()
    run("authorization")
  }
}
