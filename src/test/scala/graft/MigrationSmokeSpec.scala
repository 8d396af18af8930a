package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** A Hive user's day, end to end, through the one front door
  * (`Engine.sql`): DDL → load → stats → queries → DML → MV → governance →
  * scheduling → operability verbs — the "switch your scripts over and they
  * run" claim as a single integration test. Every statement here is plain
  * HiveQL-shaped SQL; nothing calls the library API directly except
  * assertions.
  */
class MigrationSmokeSpec extends SparkSpec with Matchers {

  private def sql(q: String) = Engine.sql(spark, sfDir, q)

  test("a migrated Hive session runs unchanged through the SQL front door") {
    val wh = java.nio.file.Files.createTempDirectory("smoke_wh_").toString
    try {
      // --- DDL + load: a managed snapshot table and an ingest ------------
      sql(s"CREATE TABLE smoke_sales (o_orderkey BIGINT, o_orderstatus STRING, " +
        s"o_totalprice DOUBLE) USING snapshot LOCATION '$wh/sales'")
      sql("""INSERT INTO smoke_sales
            |SELECT o_orderkey, o_orderstatus, o_totalprice
            |FROM orders WHERE o_orderkey <= 2000""".stripMargin)
      val loaded = sql("SELECT count(*) AS n FROM smoke_sales").head.getLong(0)
      assert(loaded > 0)

      // --- queries: windows, CTEs, rollup, lateral view ------------------
      val top = sql(
        """WITH ranked AS (
          |  SELECT o_orderstatus, o_totalprice,
          |         row_number() OVER (PARTITION BY o_orderstatus
          |                            ORDER BY o_totalprice DESC) AS rk
          |  FROM smoke_sales)
          |SELECT o_orderstatus, CAST(o_totalprice AS DOUBLE) AS price
          |FROM ranked WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin)
        .collect()
      assert(top.nonEmpty)
      val rollup = sql(
        """SELECT o_orderstatus, count(*) AS n FROM smoke_sales
          |GROUP BY ROLLUP (o_orderstatus)""".stripMargin).count()
      assert(rollup >= 2)

      // --- DML: UPDATE / DELETE / MERGE on the managed table -------------
      sql("UPDATE smoke_sales SET o_totalprice = 0.0 WHERE o_orderkey % 97 = 0")
      sql("DELETE FROM smoke_sales WHERE o_orderkey % 89 = 0")
      sql("""MERGE INTO smoke_sales t
            |USING (SELECT 9000001 AS k, 'Z' AS s, 1.5 AS p) src
            |ON t.o_orderkey = src.k
            |WHEN MATCHED THEN UPDATE SET o_totalprice = src.p
            |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus,
            |  o_totalprice) VALUES (src.k, src.s, src.p)""".stripMargin)
      assert(sql("SELECT count(*) AS n FROM smoke_sales WHERE o_orderstatus = 'Z'")
        .head.getLong(0) === 1)
      assert(sql(
        "SELECT count(*) AS n FROM smoke_sales WHERE o_totalprice = 0.0 " +
          "AND o_orderkey % 97 = 0").head.getLong(0) > 0)
      assert(sql("SELECT count(*) AS n FROM smoke_sales WHERE o_orderkey % 89 = 0")
        .head.getLong(0) === 0)

      // --- time travel sees the pre-DML version --------------------------
      val v1 = sql("SELECT count(*) AS n FROM smoke_sales VERSION AS OF 1")
        .head.getLong(0)
      assert(v1 === loaded, "version 1 must be the freshly loaded state")

      // --- materialized view + rewrite -----------------------------------
      sql(s"""CREATE MATERIALIZED VIEW smoke_mv LOCATION '$wh/mv' AS
             |SELECT o_orderstatus, count(*) AS n, sum(o_totalprice) AS total
             |FROM smoke_sales GROUP BY o_orderstatus""".stripMargin)
      val mvAnswer = sql(
        """SELECT o_orderstatus, count(*) AS n FROM smoke_sales
          |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin).collect()
      assert(mvAnswer.nonEmpty)

      // --- governance: role + row filter, enforced, then admin ops -------
      sql("CREATE ROLE smoke_analyst")
      sql("GRANT ROLE smoke_analyst TO USER smoke_reader")
      sql("GRANT SELECT ON TABLE smoke_sales TO ROLE smoke_analyst")
      sql("ALTER TABLE smoke_sales SET ROW FILTER 'o_orderstatus = ''F''' " +
        "FOR ROLE smoke_analyst")
      spark.conf.set("spark.graft.authz.enabled", "true")
      spark.conf.set("spark.graft.authz.admins", "smoke_admin")
      spark.conf.set("spark.graft.user", "smoke_reader")
      val filtered = sql("SELECT count(*) AS n FROM smoke_sales").head.getLong(0)
      val asAdminN = {
        spark.conf.set("spark.graft.user", "smoke_admin")
        sql("SELECT count(*) AS n FROM smoke_sales").head.getLong(0)
      }
      assert(filtered < asAdminN, "the row filter must narrow the reader's view")
      // non-admin cannot flip enforcement or self-administer
      spark.conf.set("spark.graft.user", "smoke_reader")
      intercept[graft.plans.Authz.AccessDenied] {
        sql("SET spark.graft.authz.enabled=false") }
      intercept[graft.plans.Authz.AccessDenied] {
        sql("GRANT SELECT ON TABLE smoke_sales TO USER smoke_reader") }
      spark.conf.set("spark.graft.user", "smoke_admin")

      // --- scheduling + operability verbs --------------------------------
      sql("""CREATE SCHEDULED QUERY smoke_nightly EVERY 1 HOURS AS
            |INSERT INTO smoke_sales
            |SELECT o_orderkey + 8000000, o_orderstatus, o_totalprice
            |FROM orders WHERE o_orderkey <= 3""".stripMargin)
      sql("ALTER SCHEDULED QUERY smoke_nightly EXECUTE")
      assert(sql("SELECT count(*) AS n FROM smoke_sales " +
        "WHERE o_orderkey > 8000000 AND o_orderkey < 9000000")
        .head.getLong(0) === 3)
      assert(sql("SHOW SCHEDULED QUERIES")
        .filter(col("name") === "smoke_nightly").count() === 1)
      sql("OPTIMIZE smoke_sales")
      assert(sql("SHOW COMPACTIONS").filter(col("table") === "smoke_sales")
        .count() >= 1)
      assert(sql("SHOW LOCKS").count() === 0)
      assert(sql("SHOW TRANSACTIONS").count() === 0)
      val analyzed = sql(
        "EXPLAIN ANALYZE SELECT o_orderstatus, count(*) FROM smoke_sales " +
          "GROUP BY o_orderstatus").collect().map(_.getString(0)).mkString("\n")
      assert(analyzed.contains("numOutputRows"),
        s"EXPLAIN ANALYZE must report runtime metrics:\n$analyzed")
    } finally {
      spark.conf.unset("spark.graft.authz.enabled")
      spark.conf.unset("spark.graft.user")
      spark.conf.unset("spark.graft.authz.admins")
      graft.plans.Authz.clearAll()
      graft.plans.ScheduledQueries.drop(spark, "smoke_nightly")
      try sql("DROP MATERIALIZED VIEW smoke_mv") catch { case _: Exception => () }
      graft.plans.NamedTables.drop("smoke_sales")
    }
  }
}
