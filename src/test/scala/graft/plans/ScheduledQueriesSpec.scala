package graft.plans

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

class ScheduledQueriesSpec extends SparkSpec {

  test("due queries run once per interval, disabled ones never") {
    import spark.implicits._
    val runs = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    ScheduledQueries.create(spark, "hourly_counts", everyMillis = 3600000L) { s =>
      Engine.table(s, sfDir, "orders").groupBy($"o_orderstatus").count()
    } { df => runs += (("hourly_counts", df.count())) }
    ScheduledQueries.create(spark, "disabled_job", everyMillis = 1000L) { s =>
      Engine.table(s, sfDir, "region")
    } { df => runs += (("disabled_job", df.count())) }
    ScheduledQueries.setEnabled(spark, "disabled_job", enabled = false)

    try {
      // t=0: hourly job is due (never ran); disabled job is skipped
      assert(ScheduledQueries.runDue(spark, now = 0L) === Seq("hourly_counts"))
      // t=+30min: nothing due
      assert(ScheduledQueries.runDue(spark, now = 1800000L) === Seq.empty)
      // t=+1h: due again
      assert(ScheduledQueries.runDue(spark, now = 3600000L) === Seq("hourly_counts"))
      assert(runs.map(_._1) === Seq("hourly_counts", "hourly_counts"))
      assert(runs.forall(_._2 === 3L)) // three order statuses
      assert(ScheduledQueries.list(spark).map(_.name) ===
        Seq("disabled_job", "hourly_counts"))
    } finally {
      ScheduledQueries.drop(spark, "hourly_counts")
      ScheduledQueries.drop(spark, "disabled_job")
    }
    assert(ScheduledQueries.list(spark).isEmpty)
  }

  test("a scheduled materialization keeps its target fresh") {
    import spark.implicits._
    val target = java.nio.file.Files.createTempDirectory("graft_sched_").toString + "/daily"
    ScheduledQueries.create(spark, "daily_rollup", everyMillis = 86400000L) { s =>
      Engine.table(s, sfDir, "lineitem").groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"))
    } { df => df.write.mode("overwrite").parquet(target) }
    try {
      ScheduledQueries.runDue(spark, now = 0L)
      assert(spark.read.parquet(target).count() === 3L)
    } finally ScheduledQueries.drop(spark, "daily_rollup")
  }

  test("SQL-defined schedules persist across JVM restarts via spark.graft.catalog") {
    import spark.implicits._
    def sql(q: String) = Engine.sql(spark, sfDir, q)
    val dir = java.nio.file.Files.createTempDirectory("sched_store_").toString
    val root = java.nio.file.Files.createTempDirectory("sched_tbl_").toString + "/t"
    Snapshots.create(spark, root, Seq.empty[(Long, String)].toDF("id", "tag"))
    NamedTables.registerSnapshot("sched_persist_t", root)
    spark.conf.set(NamedTables.CatalogConfKey, dir)
    try {
      sql("""CREATE SCHEDULED QUERY sp_ingest EVERY 10 MINUTES AS
            |INSERT INTO sched_persist_t
            |SELECT r_regionkey, r_name FROM region""".stripMargin)
      sql("ALTER SCHEDULED QUERY sp_ingest DISABLE")
      // simulated JVM restart: session registry + store forgotten
      ScheduledQueries.forgetSessionForTest(spark)
      ScheduledQueries.resetStoreForTest()
      assert(ScheduledQueries.list(spark).isEmpty)
      // the first scheduled-query verb re-hydrates from the durable store
      val row = sql("SHOW SCHEDULED QUERIES")
        .filter(col("name") === "sp_ingest").head
      assert(row.getLong(1) === 600000L)
      assert(row.getBoolean(2) === false, "DISABLE must survive restart")
      assert(row.getString(4).startsWith("INSERT INTO sched_persist_t"))
      // the re-hydrated statement still executes through the front door
      sql("ALTER SCHEDULED QUERY sp_ingest EXECUTE")
      assert(sql("SELECT count(*) AS n FROM sched_persist_t")
        .head.getLong(0) === 5)
      // durable drop
      sql("DROP SCHEDULED QUERY sp_ingest")
      ScheduledQueries.forgetSessionForTest(spark)
      ScheduledQueries.resetStoreForTest()
      assert(sql("SHOW SCHEDULED QUERIES")
        .filter(col("name") === "sp_ingest").count() === 0)
    } finally {
      spark.conf.unset(NamedTables.CatalogConfKey)
      ScheduledQueries.resetStoreForTest()
      ScheduledQueries.drop(spark, "sp_ingest")
      NamedTables.drop("sched_persist_t")
    }
  }

  test("the programmatic tick hydrates durable schedules on a fresh JVM") {
    import spark.implicits._
    def sql(q: String) = Engine.sql(spark, sfDir, q)
    val dir = java.nio.file.Files.createTempDirectory("sched_tick_").toString
    val root = java.nio.file.Files.createTempDirectory("sched_tick_t_").toString + "/t"
    Snapshots.create(spark, root, Seq.empty[(Long, String)].toDF("id", "tag"))
    NamedTables.registerSnapshot("sched_tick_t", root)
    spark.conf.set(NamedTables.CatalogConfKey, dir)
    try {
      sql("""CREATE SCHEDULED QUERY st_ingest EVERY 10 MINUTES AS
            |INSERT INTO sched_tick_t SELECT r_regionkey, r_name FROM region"""
        .stripMargin)
      // simulated JVM restart, then the DEPLOYMENT's tick — no SQL verb has
      // touched the session, so hydration must ride the tick itself
      ScheduledQueries.forgetSessionForTest(spark)
      ScheduledQueries.resetStoreForTest()
      assert(ScheduledQueries.list(spark).isEmpty)
      val ran = Engine.scheduledTick(spark, sfDir)
      assert(ran === Seq("st_ingest"),
        "a restarted JVM's first tick must execute the durable schedule")
      assert(sql("SELECT count(*) AS n FROM sched_tick_t").head.getLong(0) === 5)
      // next tick inside the interval: nothing due (lastRunAt persisted)
      assert(Engine.scheduledTick(spark, sfDir).isEmpty)
    } finally {
      spark.conf.unset(NamedTables.CatalogConfKey)
      ScheduledQueries.resetStoreForTest()
      ScheduledQueries.drop(spark, "st_ingest")
      NamedTables.drop("sched_tick_t")
    }
  }

  test("schedule admin verbs are authz-gated") {
    def sql(q: String) = Engine.sql(spark, sfDir, q)
    sql("CREATE SCHEDULED QUERY sg_job EVERY 1 HOURS AS SELECT 1")
    spark.conf.set("spark.graft.authz.enabled", "true")
    spark.conf.set("spark.graft.user", "sneaky")
    try {
      intercept[graft.plans.Authz.AccessDenied] {
        sql("DROP SCHEDULED QUERY sg_job") }
      intercept[graft.plans.Authz.AccessDenied] {
        sql("ALTER SCHEDULED QUERY sg_job DISABLE") }
      intercept[graft.plans.Authz.AccessDenied] {
        sql("CREATE SCHEDULED QUERY sg_mine EVERY 1 HOURS AS SELECT 1") }
      // SHOW stays open
      assert(sql("SHOW SCHEDULED QUERIES")
        .filter(org.apache.spark.sql.functions.col("name") === "sg_job")
        .count() === 1)
    } finally {
      spark.conf.unset("spark.graft.authz.enabled")
      spark.conf.unset("spark.graft.user")
      ScheduledQueries.drop(spark, "sg_job")
    }
  }

  test("SQL schedules execute as their OWNER, not as the tick's invoker") {
    import spark.implicits._
    def sql(q: String) = Engine.sql(spark, sfDir, q)
    val root = java.nio.file.Files.createTempDirectory("sched_own_").toString + "/t"
    Snapshots.create(spark, root, Seq.empty[(Long, String)].toDF("id", "tag"))
    NamedTables.registerSnapshot("sched_own_t", root)
    try {
      // the owner (an admin) schedules an ingest from region; a row filter
      // hides most of region from user 'ticker'
      spark.conf.set("spark.graft.authz.enabled", "true")
      spark.conf.set("spark.graft.authz.admins", "owner_admin")
      spark.conf.set("spark.graft.user", "owner_admin")
      sql("GRANT SELECT ON TABLE region TO ALL")
      sql("GRANT ALL ON TABLE sched_own_t TO ALL")
      sql("ALTER TABLE region SET ROW FILTER 'r_regionkey = 0' FOR USER ticker")
      sql("""CREATE SCHEDULED QUERY so_ingest EVERY 1 HOURS AS
            |INSERT INTO sched_own_t
            |SELECT r_regionkey, r_name FROM region""".stripMargin)
      // the SQL front-door tick is admin-gated (it executes statements
      // under OWNER identity — an open door would let any user trigger
      // owner-privileged side effects on demand)
      spark.conf.set("spark.graft.user", "ticker")
      intercept[graft.plans.Authz.AccessDenied] {
        sql("EXECUTE SCHEDULED QUERIES") }
      // the deployment scheduler's tick (not a SQL surface) runs while the
      // session user is a filtered non-admin — but the statement must
      // execute under the OWNER's identity, or the invoker's filter
      // silently corrupts the materialization (1 row instead of 5)
      val ran = ScheduledQueries.runDue(spark, System.currentTimeMillis())
      assert(ran.contains("so_ingest"))
      spark.conf.set("spark.graft.user", "owner_admin")
      assert(sql("SELECT count(*) AS n FROM sched_own_t").head.getLong(0) === 5,
        "the schedule must run as its owner — the invoker's row filter " +
          "leaked into the materialization")
      // and the invoker's own identity is restored after the tick
      spark.conf.set("spark.graft.user", "ticker")
      assert(Authz.currentUser(spark) === "ticker")
    } finally {
      spark.conf.unset("spark.graft.authz.enabled")
      spark.conf.unset("spark.graft.user")
      spark.conf.unset("spark.graft.authz.admins")
      Authz.clearAll()
      ScheduledQueries.drop(spark, "so_ingest")
      NamedTables.drop("sched_own_t")
    }
  }

  test("a scheduled SELECT tick forces the plan without a driver-side copy") {
    import java.util.concurrent.atomic.AtomicLong
    def sql(q: String) = Engine.sql(spark, sfDir, q)
    val resultBytes = new AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          resultBytes.addAndGet(te.taskMetrics.resultSize)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // 2M bigints ≈ 16+ MB if collect()ed to the driver; foreach keeps
      // per-task results at bookkeeping size (a few KB total)
      sql("""CREATE SCHEDULED QUERY sp_select EVERY 1 HOURS AS
            |SELECT id FROM range(2000000)""".stripMargin)
      sql("ALTER SCHEDULED QUERY sp_select EXECUTE")
      // listener events drain asynchronously: wait for quiescence
      val deadline = System.currentTimeMillis() + 5000
      var last = -1L
      while (System.currentTimeMillis() < deadline && last != resultBytes.get()) {
        last = resultBytes.get(); Thread.sleep(200)
      }
      assert(resultBytes.get() < 2L * 1024 * 1024,
        s"scheduled SELECT materialized ${resultBytes.get()} bytes on the " +
          "driver — the forcing action must not collect()")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      ScheduledQueries.drop(spark, "sp_select")
    }
  }

  test("SQL verbs: CREATE/SHOW/ALTER EXECUTE/DISABLE/DROP SCHEDULED QUERY") {
    import spark.implicits._
    def sql(q: String) = Engine.sql(spark, sfDir, q)
    val root = java.nio.file.Files.createTempDirectory("graft_sq_").toString + "/t"
    Snapshots.create(spark, root, Seq.empty[(Long, String)].toDF("id", "tag"))
    NamedTables.registerSnapshot("sq_target", root)
    try {
      sql("""CREATE SCHEDULED QUERY sq_ingest EVERY 10 MINUTES AS
            |INSERT INTO sq_target SELECT r_regionkey, r_name FROM region""".stripMargin)
      val row = sql("SHOW SCHEDULED QUERIES")
        .filter(col("name") === "sq_ingest").head
      assert(row.getLong(1) === 600000L)
      assert(row.getBoolean(2) === true)
      assert(row.getString(4).startsWith("INSERT INTO sq_target"))
      // run-now executes the stored statement through the engine front door
      sql("ALTER SCHEDULED QUERY sq_ingest EXECUTE")
      assert(sql("SELECT count(*) AS n FROM sq_target").head.getLong(0) === 5)
      // disabled queries are skipped by the due tick
      sql("ALTER SCHEDULED QUERY sq_ingest DISABLE")
      val ran = sql("EXECUTE SCHEDULED QUERIES").collect().map(_.getString(0))
      assert(!ran.contains("sq_ingest"))
      assert(sql("SELECT count(*) AS n FROM sq_target").head.getLong(0) === 5)
      sql("DROP SCHEDULED QUERY sq_ingest")
      assert(sql("SHOW SCHEDULED QUERIES")
        .filter(col("name") === "sq_ingest").count() === 0)
    } finally {
      ScheduledQueries.drop(spark, "sq_ingest")
      NamedTables.drop("sq_target")
    }
  }
}
