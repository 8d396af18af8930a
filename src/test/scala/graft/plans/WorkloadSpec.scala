package graft.plans

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import graft.{Engine, SparkSpec}

/** Workload management: resource plans, pools, triggers, mappings — the
  * reference's WLM surface over Spark job groups + scheduler pools.
  */
class WorkloadSpec extends SparkSpec with BeforeAndAfterEach {

  private def sql(q: String) = Engine.sql(spark, sfDir, q)

  override def beforeEach(): Unit = { Workload.clearAll(); super.beforeEach() }
  override def afterEach(): Unit = { Workload.clearAll(); super.afterEach() }

  test("plan DDL round-trips through SQL verbs") {
    sql("CREATE RESOURCE PLAN daytime")
    sql("CREATE POOL daytime.etl WITH ALLOC_FRACTION=0.7, QUERY_PARALLELISM=3")
    sql("CREATE POOL daytime.adhoc WITH ALLOC_FRACTION=0.3, QUERY_PARALLELISM=1")
    sql("CREATE TRIGGER daytime.slow_kill WHEN ELAPSED_TIME > 30000 DO KILL")
    sql("ALTER POOL daytime.adhoc ADD TRIGGER slow_kill")
    sql("CREATE USER MAPPING 'etl_svc' IN daytime TO etl")
    sql("ALTER RESOURCE PLAN daytime ACTIVATE")
    val plans = sql("SHOW RESOURCE PLANS").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getInt(2), r.getInt(3)))
    assert(plans.toSeq === Seq(("daytime", true, 3, 1)))
    val pools = sql("SHOW RESOURCE PLAN daytime").collect()
      .map(r => (r.getString(0), r.getString(3))).toMap
    assert(pools("adhoc") === "slow_kill")
    assert(Workload.poolFor("etl_svc") === "etl")
    assert(Workload.poolFor("someone_else") === "default")
    // active plan protects itself from DROP
    intercept[IllegalArgumentException] { sql("DROP RESOURCE PLAN daytime") }
    sql("ALTER RESOURCE PLAN daytime DISABLE")
    sql("DROP RESOURCE PLAN daytime")
    assert(sql("SHOW RESOURCE PLANS").collect().isEmpty)
  }

  test("ELAPSED_TIME KILL trigger cancels the running query's job group") {
    Workload.createPlan("wm")
    Workload.createPool("wm", "limited", 1.0, 4)
    Workload.createTrigger("wm", "t_kill", "ELAPSED_TIME", 400, Workload.Kill)
    Workload.addTriggerToPool("wm", "t_kill", "limited")
    Workload.addMapping("wm", "impatient", "limited")
    Workload.activate("wm")
    val killed = intercept[Workload.QueryKilledException] {
      Workload.run(spark, "impatient") { _ =>
        // a genuinely long-running distributed job: per-row sleeps across
        // partitions; must be cancelled well before its natural ~50s.
        // (nondeterministic + aggregated so the optimizer cannot prune
        // the sleeping projection out from under the trigger)
        val slow = udf((x: Long) => { Thread.sleep(10); x }).asNondeterministic()
        spark.range(0, 5000, 1, 8).select(slow(col("id")).as("v"))
          .agg(sum("v")).head.getLong(0)
      }
    }
    assert(killed.trigger === "t_kill")
    assert(killed.counter === "ELAPSED_TIME")
    assert(killed.value > 400)
  }

  test("queries under the limit complete unmanaged and managed alike") {
    Workload.createPlan("wm")
    Workload.createTrigger("wm", "t_kill", "ELAPSED_TIME", 60000, Workload.Kill)
    Workload.addTriggerToPool("wm", "t_kill", "default")
    Workload.activate("wm")
    val n = Workload.run(spark, "ok_user") { pool =>
      assert(pool === "default")
      spark.range(1000).count()
    }
    assert(n === 1000)
  }

  test("SHUFFLE_BYTES trigger fires on shuffle-heavy queries only") {
    Workload.createPlan("wm")
    // 100 KB limit: a scalar aggregate's partial-row exchange (a few
    // hundred bytes) stays far under it; a fact-sized repartition blows it
    Workload.createTrigger("wm", "t_shuffle", "SHUFFLE_BYTES", 100 * 1024,
      Workload.Kill)
    Workload.addTriggerToPool("wm", "t_shuffle", "default")
    Workload.activate("wm")
    val ok = Workload.run(spark, "u") { _ =>
      spark.range(0, 1000, 1, 4).selectExpr("sum(id)").head.getLong(0) }
    assert(ok === 499500L)
    // heavy repartition exchange with per-row sleeps downstream so the
    // watchdog observes the counters mid-flight
    intercept[Workload.QueryKilledException] {
      Workload.run(spark, "u") { _ =>
        val slow = udf((x: Long) => { Thread.sleep(2); x }).asNondeterministic()
        spark.range(0, 40000, 1, 8).repartition(32, col("id"))
          .select(slow(col("id")).as("v")).agg(sum("v")).head.getLong(0)
      }
    }
  }

  test("HDFS_BYTES_READ trigger fires on scan volume") {
    Workload.createPlan("wm")
    // parquet scans of the testdata cross 1 KB immediately; a pure
    // range-based query reads no files and never fires
    Workload.createTrigger("wm", "t_read", "HDFS_BYTES_READ", 1024, Workload.Kill)
    Workload.addTriggerToPool("wm", "t_read", "default")
    Workload.activate("wm")
    val ok = Workload.run(spark, "u")(_ => spark.range(100000).count())
    assert(ok === 100000L)
    intercept[Workload.QueryKilledException] {
      Workload.run(spark, "u") { _ =>
        // scan stage ends fast (recording its bytesRead), then the slow
        // post-shuffle stage gives the watchdog a window to fire
        val slow = udf((x: Long) => { Thread.sleep(5); x }).asNondeterministic()
        graft.Engine.table(spark, sfDir, "lineitem")
          .repartition(32, col("l_orderkey"))
          .select(slow(col("l_orderkey")).as("v")).agg(sum("v")).head.getLong(0)
      }
    }
  }

  test("QUERY_PARALLELISM admits at most N concurrent queries per pool") {
    Workload.createPlan("wm")
    Workload.createPool("wm", "serial", 1.0, 1)
    Workload.addMapping("wm", "worker", "serial")
    Workload.activate("wm")
    val active = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    try {
      val jobs = (0 until 3).map { _ =>
        pool.submit(new Runnable {
          override def run(): Unit = Workload.run(spark, "worker") { _ =>
            val now = active.incrementAndGet()
            maxSeen.updateAndGet(m => math.max(m, now))
            Thread.sleep(150)
            active.decrementAndGet()
            spark.range(10).count()
          }
        })
      }
      jobs.foreach(_.get())
    } finally pool.shutdown()
    assert(maxSeen.get() === 1) // admission control serialized the pool
  }

  test("MOVE trigger re-routes the user's session to the target pool") {
    Workload.createPlan("wm")
    Workload.createPool("wm", "interactive", 0.8, 4)
    Workload.createPool("wm", "batch", 0.2, 4)
    Workload.createTrigger("wm", "t_move", "ELAPSED_TIME", 200,
      Workload.MoveTo("batch"))
    Workload.addTriggerToPool("wm", "t_move", "interactive")
    Workload.addMapping("wm", "analyst", "interactive")
    Workload.activate("wm")
    assert(Workload.poolFor("analyst") === "interactive")
    Workload.run(spark, "analyst") { pool =>
      assert(pool === "interactive")
      val slow = udf((x: Long) => { Thread.sleep(1); x }).asNondeterministic()
      spark.range(0, 2000, 1, 4).select(slow(col("id")).as("v"))
        .agg(sum("v")).head.getLong(0) // outlasts the 200ms move threshold, completes (not killed)
    }
    // the move applies at the next scheduling point: subsequent statements
    assert(Workload.poolFor("analyst") === "batch")
    Workload.run(spark, "analyst")(pool => assert(pool === "batch"))
  }

  test("re-defining a pool re-sizes its admission control (no stale semaphore)") {
    Workload.createPlan("wm")
    Workload.createPool("wm", "grow", 1.0, 1)
    Workload.addMapping("wm", "worker", "grow")
    Workload.activate("wm")
    // first run caches the parallelism-1 semaphore for wm/grow
    Workload.run(spark, "worker")(_ => spark.range(10).count())
    // re-defining the pool with parallelism 3 must take effect — the
    // first-ever value may not keep enforcing forever
    Workload.createPool("wm", "grow", 1.0, 3)
    val active = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    try {
      (0 until 3).map { _ =>
        pool.submit(new Runnable {
          override def run(): Unit = Workload.run(spark, "worker") { _ =>
            val now = active.incrementAndGet()
            maxSeen.updateAndGet(m => math.max(m, now))
            Thread.sleep(300)
            active.decrementAndGet()
            spark.range(10).count()
          }
        })
      }.foreach(_.get())
    } finally pool.shutdown()
    assert(maxSeen.get() >= 2,
      s"stale parallelism-1 semaphore still enforced (maxSeen=${maxSeen.get()})")
  }

  test("resource plans persist across JVM restarts via spark.graft.catalog") {
    val dir = java.nio.file.Files.createTempDirectory("wlm_store_").toString
    spark.conf.set(NamedTables.CatalogConfKey, dir)
    try {
      Workload.bootstrap(spark)
      sql("CREATE RESOURCE PLAN nightly")
      sql("CREATE POOL nightly.compact WITH ALLOC_FRACTION=0.6, QUERY_PARALLELISM=2")
      sql("CREATE TRIGGER nightly.t_kill WHEN ELAPSED_TIME > 30000 DO KILL")
      sql("ALTER POOL nightly.compact ADD TRIGGER t_kill")
      sql("CREATE USER MAPPING 'compactor' IN nightly TO compact")
      sql("ALTER RESOURCE PLAN nightly ACTIVATE")
      // simulated JVM restart: memory forgotten, store detached
      Workload.clearAll()
      assert(Workload.planNames.isEmpty)
      Workload.bootstrap(spark) // fresh boot reloads the durable database
      assert(Workload.planNames === Seq("nightly"))
      assert(Workload.activePlan.map(_.name) === Some("nightly"),
        "the ACTIVE plan must survive restart (a plan that forgets it was " +
          "active defeats its purpose)")
      val p = Workload.plan("nightly").get
      assert(p.pools("compact").queryParallelism === 2)
      assert(p.pools("compact").triggers === Set("t_kill"))
      assert(p.triggers("t_kill").limit === 30000L)
      assert(Workload.poolFor("compactor") === "compact")
      val shown = sql("SHOW RESOURCE PLANS").collect()
        .map(r => (r.getString(0), r.getBoolean(1)))
      assert(shown.toSeq === Seq(("nightly", true)))
      // durable drop: deactivate + drop survives restart too
      sql("ALTER RESOURCE PLAN nightly DISABLE")
      sql("DROP RESOURCE PLAN nightly")
      Workload.clearAll()
      Workload.bootstrap(spark)
      assert(Workload.planNames.isEmpty)
    } finally {
      spark.conf.unset(NamedTables.CatalogConfKey)
      Workload.clearAll()
    }
  }

  test("plans created BEFORE bootstrap persist, including their later edits") {
    val dir = java.nio.file.Files.createTempDirectory("wlm_pre_").toString
    try {
      // programmatic plan minted while no durable catalog exists yet
      Workload.createPlan("preboot")
      spark.conf.set(NamedTables.CatalogConfKey, dir)
      Workload.bootstrap(spark)
      // edits AFTER bootstrap replay against durable state — they must
      // find the pre-bootstrap plan there, not silently no-op
      sql("CREATE POOL preboot.etl WITH ALLOC_FRACTION=0.5, QUERY_PARALLELISM=3")
      sql("ALTER RESOURCE PLAN preboot ACTIVATE")
      Workload.clearAll()
      Workload.bootstrap(spark)
      assert(Workload.planNames === Seq("preboot"),
        "a pre-bootstrap plan vanished on restart — bootstrap must write " +
          "memory-only plans through to the store")
      assert(Workload.activePlan.map(_.name) === Some("preboot"))
      assert(Workload.plan("preboot").get.pools("etl").queryParallelism === 3)
    } finally {
      spark.conf.unset(NamedTables.CatalogConfKey)
      Workload.clearAll()
    }
  }

  test("WLM admin verbs are authz-gated: a denied user cannot sabotage the plan") {
    Workload.createPlan("prod")
    Workload.createTrigger("prod", "t_kill", "ELAPSED_TIME", 30000, Workload.Kill)
    Workload.addTriggerToPool("prod", "t_kill", "default")
    Workload.activate("prod")
    spark.conf.set("spark.graft.authz.enabled", "true")
    spark.conf.set("spark.graft.user", "sneaky")
    try {
      intercept[Authz.AccessDenied] { sql("ALTER RESOURCE PLAN prod DISABLE") }
      intercept[Authz.AccessDenied] { sql("DROP TRIGGER prod.t_kill") }
      intercept[Authz.AccessDenied] { sql("CREATE RESOURCE PLAN mine") }
      intercept[Authz.AccessDenied] {
        sql("CREATE USER MAPPING 'sneaky' IN prod TO default") }
      assert(Workload.activePlan.map(_.name) === Some("prod"),
        "the plan must survive a non-admin's sabotage attempts")
      // SHOW stays open; admins administer
      assert(sql("SHOW RESOURCE PLANS").count() === 1)
      spark.conf.set("spark.graft.authz.admins", "ops")
      spark.conf.set("spark.graft.user", "ops")
      sql("ALTER RESOURCE PLAN prod DISABLE")
      assert(Workload.activePlan.isEmpty)
    } finally {
      spark.conf.unset("spark.graft.authz.enabled")
      spark.conf.unset("spark.graft.user")
      spark.conf.unset("spark.graft.authz.admins")
    }
  }

  test("the active plan compiles to a real fair-scheduler allocation file") {
    Workload.createPlan("wm")
    Workload.createPool("wm", "etl", 0.75, 3)
    Workload.createPool("wm", "adhoc", 0.25, 2)
    val xml = Workload.toFairSchedulerXml(Workload.plan("wm").get)
    assert(xml.contains("<pool name=\"etl\">"))
    assert(xml.contains("<weight>750</weight>"))
    assert(xml.contains("<pool name=\"adhoc\">"))
    assert(xml.contains("<weight>250</weight>"))
    // well-formed enough for the scheduler: parses as XML
    val parsed = scala.xml.XML.loadString(xml)
    assert((parsed \\ "pool").length === 3) // etl, adhoc + default
  }
}
