package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import IncrementalViews.AggSpec

/** Incremental aggregate materializations over snapshot tables: insert-only
  * refreshes fold just the delta; COW commits force a full rebuild; results
  * always equal a from-scratch aggregation of the current snapshot.
  */
class IncrementalViewsSpec extends SparkSpec {

  private def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/x"

  private def rows(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"g${i % 3}", i * 1.5)).toDF("id", "grp", "v")
  }

  private val specs = Seq(AggSpec("count", "*", "n"), AggSpec("sum", "v", "sv"),
    AggSpec("min", "id", "mn"), AggSpec("max", "id", "mx"),
    AggSpec("avg", "v", "av"))

  private def expected(t: Snapshots.SnapshotTable): DataFrame =
    t.read().groupBy(col("grp")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
      min(col("id")).as("mn"), max(col("id")).as("mx"), avg(col("v")).as("av"))

  private def assertMatches(mv: IncrementalViews.IncrementalAggView,
      t: Snapshots.SnapshotTable): Unit = {
    val got = mv.read()
    val want = expected(t)
    assert(got.count() === want.count())
    assert(got.except(want).count() === 0 && want.except(got).count() === 0,
      s"mv=${got.orderBy("grp").collect().mkString(";")} " +
        s"want=${want.orderBy("grp").collect().mkString(";")}")
  }

  test("create materializes the current aggregate (avg derived from sum+count)") {
    val t = Snapshots.create(spark, fresh("graft_imv_"), rows(0, 90))
    val mv = IncrementalViews.create(spark, t.root, fresh("graft_imvd_"),
      Seq("grp"), specs)
    assertMatches(mv, t)
    assert(mv.version() === 0L)
  }

  test("append-only refresh is incremental and exact (including new groups)") {
    import spark.implicits._
    val t = Snapshots.create(spark, fresh("graft_imv_"), rows(0, 90))
    val mv = IncrementalViews.create(spark, t.root, fresh("graft_imvd_"),
      Seq("grp"), specs)
    t.append(rows(90, 150))
    // a brand-new group arrives only in the delta
    t.append(Seq((9999L, "g_new", 2.0)).toDF("id", "grp", "v"))
    val r = mv.refresh()
    assert(r.mode === "incremental", s"expected incremental, got $r")
    assert(r.deltaRows === 61)
    assertMatches(mv, t)
    assert(mv.read().filter(col("grp") === "g_new").count() === 1)
    assert(mv.version() === t.latest().version)
  }

  test("compaction between appends stays on the incremental path") {
    val t = Snapshots.create(spark, fresh("graft_imv_"), rows(0, 30).coalesce(1))
    val mv = IncrementalViews.create(spark, t.root, fresh("graft_imvd_"),
      Seq("grp"), specs)
    t.append(rows(30, 60).coalesce(1))
    t.compact(targetBytes = 512L * 1024 * 1024)
    t.append(rows(60, 90).coalesce(1))
    val r = mv.refresh()
    assert(r.mode === "incremental")
    assert(r.deltaRows === 60, "compaction's rewritten files must not re-count")
    assertMatches(mv, t)
  }

  test("z-ordering between appends stays on the incremental path") {
    val t = Snapshots.create(spark, fresh("graft_imv_"), rows(0, 30).coalesce(1))
    val mv = IncrementalViews.create(spark, t.root, fresh("graft_imvd_"),
      Seq("grp"), specs)
    t.append(rows(30, 60).coalesce(1))
    t.zOrderBy(Seq("id", "grp"))
    t.append(rows(60, 90).coalesce(1))
    val r = mv.refresh()
    assert(r.mode === "incremental",
      "a data-identical zorder commit must not force a full rebuild")
    assert(r.deltaRows === 60)
    assertMatches(mv, t)
  }

  test("COW commits (delete/update/merge) force a full rebuild") {
    val t = Snapshots.create(spark, fresh("graft_imv_"), rows(0, 90))
    val mv = IncrementalViews.create(spark, t.root, fresh("graft_imvd_"),
      Seq("grp"), specs)
    // deletion can retire a min/max and lower sums — insert-only folding
    // cannot express that
    t.deleteWhere(col("id") < 10)
    val r = mv.refresh()
    assert(r.mode === "full", s"expected full rebuild, got $r")
    assertMatches(mv, t)
    // and refresh after the rebuild is a no-op
    assert(mv.refresh().mode === "noop")
  }

  test("MV over an empty table materializes and refreshes once rows arrive") {
    import spark.implicits._
    val t = Snapshots.create(spark, fresh("graft_imv_"), rows(0, 0))
    val mv = IncrementalViews.create(spark, t.root, fresh("graft_imvd_"),
      Seq("grp"), specs)
    assert(mv.read().count() === 0)
    t.append(rows(0, 30))
    assert(mv.refresh().mode === "incremental")
    assertMatches(mv, t)
  }

  test("refresh cost is delta-proportional: appended rows only, never the table") {
    val t = Snapshots.create(spark, fresh("graft_imv_"), rows(0, 1000))
    val mv = IncrementalViews.create(spark, t.root, fresh("graft_imvd_"),
      Seq("grp"), specs)
    t.append(rows(1000, 1010))
    val r = mv.refresh()
    assert(r.mode === "incremental")
    assert(r.deltaRows === 10, "delta must be the appended rows, not a rescan")
    assertMatches(mv, t)
  }

  // ---- join MVs: Δ(A⋈B) = ΔA⋈B_new ∪ A_old⋈ΔB ------------------------

  private def orders(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, (i % 20).toLong, i * 2.0))
      .toDF("oid", "cid", "price")
  }
  private def custs(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"seg${i % 4}")).toDF("cid", "seg")
  }

  private def expectedJoin(l: Snapshots.SnapshotTable,
      r: Snapshots.SnapshotTable): DataFrame =
    l.read().join(r.read(), "cid").groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("price")).as("rev"),
        avg(col("price")).as("ap"))

  private def assertJoinMatches(mv: IncrementalViews.IncrementalJoinAggView,
      l: Snapshots.SnapshotTable, r: Snapshots.SnapshotTable): Unit = {
    val got = mv.read().orderBy("seg").collect().map(_.toSeq).toSeq
    val want = expectedJoin(l, r).orderBy("seg").collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  private val joinSpecs = Seq(AggSpec("count", "*", "n"),
    AggSpec("sum", "price", "rev"), AggSpec("avg", "price", "ap"))

  test("join MV: appends to either or both sides fold incrementally") {
    val l = Snapshots.create(spark, fresh("ivj_l"), orders(0, 200))
    val r = Snapshots.create(spark, fresh("ivj_r"), custs(0, 12))
    val mv = IncrementalViews.createJoin(spark, l.root, r.root,
      fresh("ivj_mv"), Seq(("cid", "cid")), Seq("seg"), joinSpecs)
    assertJoinMatches(mv, l, r)
    // left-only append
    l.append(orders(200, 260))
    assert(mv.refresh().mode === "incremental")
    assertJoinMatches(mv, l, r)
    // right-only append: rows 12..19 now gain their customer — all their
    // accumulated orders must fold in via A_old ⋈ ΔB
    r.append(custs(12, 20))
    assert(mv.refresh().mode === "incremental")
    assertJoinMatches(mv, l, r)
    // BOTH sides appended since the last refresh: ΔA⋈ΔB must land exactly
    // once (new orders of cid 12..19 joined against just-added customers)
    l.append(orders(260, 300))
    r.append(custs(20, 20)) // empty right delta commit is fine too
    val res = mv.refresh()
    assert(res.mode === "incremental")
    assertJoinMatches(mv, l, r)
    // noop when current
    assert(mv.refresh().mode === "noop")
  }

  test("join MV: a COW commit on either side forces a full rebuild") {
    val l = Snapshots.create(spark, fresh("ivj_l2"), orders(0, 100))
    val r = Snapshots.create(spark, fresh("ivj_r2"), custs(0, 20))
    val mvp = fresh("ivj_mv2")
    val mv = IncrementalViews.createJoin(spark, l.root, r.root,
      mvp, Seq(("cid", "cid")), Seq("seg"), joinSpecs)
    l.deleteWhere(col("oid") < 10)
    assert(mv.refresh().mode === "full",
      "a delete can retire joined rows — insert-only maintenance must bail")
    assertJoinMatches(mv, l, r)
    r.updateWhere(col("cid") === 3, Map("seg" -> lit("segX")))
    assert(mv.refresh().mode === "full")
    assertJoinMatches(mv, l, r)
    // reopened view (fresh JVM analog) resumes from persisted two-sided state
    val mv2 = IncrementalViews.openJoin(spark, l.root, r.root,
      mvp, Seq(("cid", "cid")), Seq("seg"), joinSpecs)
    l.append(orders(100, 120))
    assert(mv2.refresh().mode === "incremental")
    assertJoinMatches(mv2, l, r)
  }

  // ------------------------- delete-aware maintenance (signed deltas) ----

  /** sum/count/avg only: the signed-delta form exists for these (ref
    * HiveAggregateInsertDeleteIncrementalRewritingRule.java); min/max force
    * the full path under deletes.
    */
  private val signedSpecs = Seq(AggSpec("count", "*", "n"),
    AggSpec("sum", "v", "sv"), AggSpec("avg", "v", "av"))

  private def expectedSigned(t: Snapshots.SnapshotTable): DataFrame =
    t.read().groupBy(col("grp")).agg(count(lit(1)).as("n"),
      sum(col("v")).as("sv"), avg(col("v")).as("av"))

  private def assertSignedMatches(mv: IncrementalViews.IncrementalAggView,
      t: Snapshots.SnapshotTable): Unit = {
    val got = mv.read(); val want = expectedSigned(t)
    assert(got.count() === want.count(),
      s"mv=${got.orderBy("grp").collect().mkString(";")} " +
        s"want=${want.orderBy("grp").collect().mkString(";")}")
    assert(got.except(want).count() === 0 && want.except(got).count() === 0,
      s"mv=${got.orderBy("grp").collect().mkString(";")} " +
        s"want=${want.orderBy("grp").collect().mkString(";")}")
  }

  test("MOR delete refresh is incremental: retired rows fold as signed deltas") {
    val t = Snapshots.create(spark, fresh("graft_imv_"), rows(0, 90))
    val mv = IncrementalViews.create(spark, t.root, fresh("graft_imvd_"),
      Seq("grp"), signedSpecs)
    t.deleteWhereMergeOnRead(col("id") < 30)
    t.append(rows(90, 110))
    val r = mv.refresh()
    assert(r.mode === "incremental",
      s"MOR deletes must maintain incrementally, got $r")
    assert(r.deltaRows === 30 + 20,
      "delta cost must be retired + appended rows, never the table")
    assertSignedMatches(mv, t)
    assert(mv.version() === t.latest().version)
  }

  test("MOR update folds as retire-old + insert-new in one refresh") {
    val t = Snapshots.create(spark, fresh("graft_imv_"), rows(0, 60))
    val mv = IncrementalViews.create(spark, t.root, fresh("graft_imvd_"),
      Seq("grp"), signedSpecs)
    t.updateWhereMergeOnRead(col("id") % 5 === 0, Map("v" -> lit(100.0)))
    val r = mv.refresh()
    assert(r.mode === "incremental", s"got $r")
    assert(r.deltaRows === 24, "12 retired old images + 12 new images")
    assertSignedMatches(mv, t)
  }

  test("a fully-retired group disappears from the MV, like a rebuild's would") {
    import spark.implicits._
    val t = Snapshots.create(spark, fresh("graft_imv_"),
      rows(0, 30).unionByName(
        Seq((500L, "doomed", 9.0), (501L, "doomed", 1.0))
          .toDF("id", "grp", "v")))
    val mv = IncrementalViews.create(spark, t.root, fresh("graft_imvd_"),
      Seq("grp"), signedSpecs)
    assert(mv.read().filter(col("grp") === "doomed").count() === 1)
    t.deleteWhereMergeOnRead(col("grp") === "doomed")
    assert(mv.refresh().mode === "incremental")
    assert(mv.read().filter(col("grp") === "doomed").count() === 0,
      "a group with every row retired must vanish")
    assertSignedMatches(mv, t)
  }

  test("rows appended then MOR-deleted within the window net to zero") {
    val t = Snapshots.create(spark, fresh("graft_imv_"), rows(0, 30))
    val mv = IncrementalViews.create(spark, t.root, fresh("graft_imvd_"),
      Seq("grp"), signedSpecs)
    t.append(rows(30, 60))
    t.deleteWhereMergeOnRead(col("id") >= 40) // retires 20 just-appended rows
    val r = mv.refresh()
    assert(r.mode === "incremental")
    assertSignedMatches(mv, t)
    // a second delete-then-refresh keeps folding (sidecar diff is correct
    // across successive MOR refreshes)
    t.deleteWhereMergeOnRead(col("id") < 5)
    assert(mv.refresh().mode === "incremental")
    assertSignedMatches(mv, t)
  }

  test("min/max under deletes, and compaction mixed with MOR, full-rebuild") {
    // min/max present: a retired extreme cannot fold — full path
    val t = Snapshots.create(spark, fresh("graft_imv_"), rows(0, 60))
    val mv = IncrementalViews.create(spark, t.root, fresh("graft_imvd_"),
      Seq("grp"), specs) // includes min/mx
    t.deleteWhereMergeOnRead(col("id") < 10)
    assert(mv.refresh().mode === "full",
      "min/max cannot fold a retired extreme")
    assertMatches(mv, t)
    // compact consolidates delete sidecars: mixed with MOR in one window
    // the sidecar diff is unsound — must take the full path
    val t2 = Snapshots.create(spark, fresh("graft_imv_"), rows(0, 60))
    val mv2 = IncrementalViews.create(spark, t2.root, fresh("graft_imvd_"),
      Seq("grp"), signedSpecs)
    t2.deleteWhereMergeOnRead(col("id") < 10)
    t2.compact(targetBytes = 512L * 1024 * 1024, minInputFiles = 1)
    assert(mv2.refresh().mode === "full",
      "compaction in a MOR window rewrites sidecars — diff is unsound")
    assertSignedMatches(mv2, t2)
  }
}
