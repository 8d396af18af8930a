package graft.plans

import graft.{Engine, SparkSpec}

/** The grouping-set dedup must remove ONLY provably-identical sets: the
  * render key is separator-joined, so distinct sets whose bare
  * concatenations collide — (a, bc) vs (ab, c) — survive.
  */
class GroupingSetsDedupSpec extends SparkSpec {

  test("concatenation-colliding distinct sets are kept; identical sets " +
      "dedup") {
    import spark.implicits._
    Seq(("x", "y", "z", "w")).toDF("a", "bc", "ab", "c")
      .createOrReplaceTempView("gsd_t")
    val both = Engine.sql(spark, sfDir,
      "SELECT a, bc, ab, c, count(*) AS n FROM gsd_t " +
        "GROUP BY a, bc, ab, c GROUPING SETS ((a, bc), (ab, c))")
    assert(both.count() === 2, "distinct sets must both answer")
    val one = Engine.sql(spark, sfDir,
      "SELECT a, count(*) AS n FROM gsd_t GROUP BY a " +
        "GROUPING SETS ((a), (a))")
    assert(one.count() === 1, "identical sets answer once (Hive dedup)")
  }
}
