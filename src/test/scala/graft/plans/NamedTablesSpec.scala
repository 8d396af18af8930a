package graft.plans

import graft.SparkSpec

/** Durable name registry: registrations written through to the
  * spark.graft.catalog directory survive a simulated JVM restart
  * (in-memory state cleared, fresh bootstrap), and drops are durable too.
  */
class NamedTablesSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Run `body` with a scratch persisted catalog installed, restoring the
    * in-memory registry (and detaching the store) afterwards so other
    * suites' registrations are untouched.
    */
  private def withCatalog(body: String => Unit): Unit = {
    val before = NamedTables.all()
    val dir = tmp("graft_cat_")
    spark.conf.set(NamedTables.CatalogConfKey, dir)
    try {
      NamedTables.resetForTest()
      NamedTables.bootstrap(spark)
      body(dir)
    } finally {
      spark.conf.unset(NamedTables.CatalogConfKey)
      NamedTables.resetForTest()
      before.foreach { case (n, ref) => NamedTables.register(n, ref) }
    }
  }

  test("registrations survive a simulated JVM restart via the catalog dir") {
    withCatalog { dir =>
      import spark.implicits._
      val root = tmp("graft_cat_tbl_") + "/t"
      Snapshots.create(spark, root,
        Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
      NamedTables.registerSnapshot("cat_persist_t", root,
        NamedTables.WriteMor)
      NamedTables.registerPath("cat_persist_p", "/tmp/nowhere")

      // restart: wipe in-memory state, re-bootstrap from the same dir
      NamedTables.resetForTest()
      assert(NamedTables.get("cat_persist_t").isEmpty)
      NamedTables.bootstrap(spark)
      assert(NamedTables.get("cat_persist_t") ===
        Some(NamedTables.SnapshotRef(root, NamedTables.WriteMor)))
      assert(NamedTables.get("cat_persist_p") ===
        Some(NamedTables.PathRef("/tmp/nowhere")))
      // the re-loaded name serves queries with no re-CREATE
      assert(graft.Engine.sql(spark, sfDir,
        "SELECT count(*) AS n FROM cat_persist_t").head().getLong(0) == 2)

      // durable drop: deregistration survives restart too
      NamedTables.drop("cat_persist_p")
      NamedTables.resetForTest()
      NamedTables.bootstrap(spark)
      assert(NamedTables.get("cat_persist_p").isEmpty)
      assert(NamedTables.get("cat_persist_t").isDefined)
    }
  }

  test("substitution reaches CTE definitions, and in-scope CTE aliases shadow registered names") {
    import spark.implicits._
    val root = tmp("graft_cte_tbl_") + "/t"
    Snapshots.create(spark, root,
      (0 until 8).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    NamedTables.registerSnapshot("cte_sub_t", root)
    try {
      // the registered name appears ONLY inside the CTE definition —
      // cteRelations are not plan children, so a naive transform never
      // substitutes it and analysis fails with TABLE_OR_VIEW_NOT_FOUND
      assert(graft.Engine.sql(spark, sfDir,
        """WITH x AS (SELECT id FROM cte_sub_t WHERE id < 3)
          |SELECT count(*) AS n FROM x""".stripMargin).head.getLong(0) === 3)
      // a CTE named like the registered table shadows it where visible
      // (analyzer precedence) ...
      assert(graft.Engine.sql(spark, sfDir,
        """WITH cte_sub_t AS (SELECT 1 AS one)
          |SELECT count(*) AS n FROM cte_sub_t""".stripMargin)
        .head.getLong(0) === 1)
      // ... but a nested CTE of that name exempts nothing outside its
      // scope: the outer reference still reads the real 8-row table
      assert(graft.Engine.sql(spark, sfDir,
        """SELECT count(*) AS n FROM (
          |  SELECT id FROM cte_sub_t
          |  UNION ALL
          |  SELECT c FROM (WITH cte_sub_t AS (SELECT 1 AS c)
          |                 SELECT c FROM cte_sub_t))""".stripMargin)
        .head.getLong(0) === 9)
    } finally NamedTables.drop("cte_sub_t")
  }

  test("concurrent registrations CAS without losing either") {
    withCatalog { dir =>
      val t1 = new Thread(() =>
        (0 until 10).foreach(i => NamedTables.registerPath(s"cat_race_a$i", s"/a$i")))
      val t2 = new Thread(() =>
        (0 until 10).foreach(i => NamedTables.registerPath(s"cat_race_b$i", s"/b$i")))
      t1.start(); t2.start(); t1.join(); t2.join()
      NamedTables.resetForTest()
      NamedTables.bootstrap(spark)
      (0 until 10).foreach { i =>
        assert(NamedTables.get(s"cat_race_a$i").isDefined, s"lost a$i")
        assert(NamedTables.get(s"cat_race_b$i").isDefined, s"lost b$i")
      }
    }
  }
}
