package graft

/** Qtest conformance, limit family: `limit_pushdown.q` (ordered limits
  * over src and alltypesorc, distinct/count-distinct under limit) and
  * `offset_limit.q` — Hive's MySQL-style `LIMIT offset,count` tail, a
  * parse error to Spark until Engine.sql's front-door rewrite (this wave's
  * finding: the comma form simply failed before). Plus
  * `groupby_multi_single_reducer.q`'s multi-aggregate bodies as bare
  * SELECTs (multi-insert scaffolding gated separately at q34/s18).
  *
  * Tie-safety: `ORDER BY key LIMIT n` over src cuts inside duplicate-key
  * groups, but src rows with equal keys are IDENTICAL (value =
  * 'val_<key>'), so any tie choice yields the same multiset.
  */
class QtestLimitSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("limit_pushdown.q", "lp1",
      "SELECT key, value FROM qt_src ORDER BY key LIMIT 20",
      ordered = true),
    QCase("limit_pushdown.q", "lp2",
      "SELECT key, value FROM qt_src ORDER BY key DESC LIMIT 20",
      ordered = true),
    QCase("limit_pushdown.q", "lp3",
      "SELECT value, sum(CAST(key AS DOUBLE) + 1) AS s FROM qt_src " +
        "GROUP BY value ORDER BY value LIMIT 20",
      ordered = true),
    QCase("limit_pushdown.q", "lp4",
      "SELECT DISTINCT(cdouble) AS dis FROM qt_alltypesorc " +
        "ORDER BY dis LIMIT 20",
      ordered = true,
      duck = Some("SELECT DISTINCT(cdouble) AS dis FROM qt_alltypesorc " +
        "ORDER BY dis NULLS LAST LIMIT 20")),
    QCase("limit_pushdown.q", "lp5",
      "SELECT ctinyint, count(DISTINCT(cdouble)) AS c " +
        "FROM qt_alltypesorc GROUP BY ctinyint ORDER BY ctinyint LIMIT 20",
      ordered = true,
      duck = Some("SELECT ctinyint, count(DISTINCT(cdouble)) AS c " +
        "FROM qt_alltypesorc GROUP BY ctinyint " +
        "ORDER BY ctinyint NULLS LAST LIMIT 20")),
    QCase("limit_pushdown.q", "lp6",
      """SELECT ctinyint, count(cdouble) AS c FROM
        |  (SELECT ctinyint, cdouble FROM qt_alltypesorc
        |   GROUP BY ctinyint, cdouble) t1
        |GROUP BY ctinyint ORDER BY ctinyint LIMIT 20""".stripMargin,
      ordered = true,
      duck = Some("""SELECT ctinyint, count(cdouble) AS c FROM
        |  (SELECT ctinyint, cdouble FROM qt_alltypesorc
        |   GROUP BY ctinyint, cdouble) t1
        |GROUP BY ctinyint ORDER BY ctinyint NULLS LAST LIMIT 20"""
        .stripMargin)),

    QCase("offset_limit.q", "ol1",
      "SELECT key, sum(CAST(substr(value, 5) AS DOUBLE)) AS s " +
        "FROM qt_src GROUP BY key ORDER BY key LIMIT 10,10",
      ordered = true,
      duck = Some("SELECT key, sum(CAST(substr(value, 5) AS DOUBLE)) AS s " +
        "FROM qt_src GROUP BY key ORDER BY key LIMIT 10 OFFSET 10"),
      note = "Hive's comma form = LIMIT count OFFSET offset (front-door " +
        "rewrite; was a plain parse failure)"),
    QCase("offset_limit.q", "ol2",
      "SELECT key, sum(CAST(substr(value, 5) AS DOUBLE)) AS s " +
        "FROM qt_src GROUP BY key ORDER BY key LIMIT 0,10",
      ordered = true,
      duck = Some("SELECT key, sum(CAST(substr(value, 5) AS DOUBLE)) AS s " +
        "FROM qt_src GROUP BY key ORDER BY key LIMIT 10 OFFSET 0")),
    QCase("offset_limit.q", "ol3",
      "SELECT key, sum(CAST(substr(value, 5) AS DOUBLE)) AS s " +
        "FROM qt_src GROUP BY key ORDER BY key LIMIT 300,100",
      ordered = true,
      duck = Some("SELECT key, sum(CAST(substr(value, 5) AS DOUBLE)) AS s " +
        "FROM qt_src GROUP BY key ORDER BY key LIMIT 100 OFFSET 300"),
      note = "offset past most of the 309 distinct keys: a short tail"),
    QCase("offset_limit.q", "ol4",
      "SELECT key, sum(CAST(substr(value, 5) AS DOUBLE)) AS s " +
        "FROM qt_src GROUP BY key ORDER BY key LIMIT 100 OFFSET 300",
      ordered = true,
      note = "the standard OFFSET spelling parses natively"),

    QCase("groupby_multi_single_reducer.q", "gms1",
      """SELECT substr(key, 1, 1) AS k,
        |  count(DISTINCT substr(value, 5)) AS c1,
        |  concat(substr(key, 1, 1),
        |    CAST(sum(CAST(substr(value, 5) AS DOUBLE)) AS STRING)) AS c2,
        |  sum(DISTINCT CAST(substr(value, 5) AS DOUBLE)) AS c3,
        |  count(value) AS c4
        |FROM qt_src WHERE substr(key, 1, 1) >= '5'
        |GROUP BY substr(key, 1, 1)""".stripMargin,
      note = "the dest_g2 body: count-distinct + plain sum + " +
        "sum-distinct + count in ONE aggregate (implicit coercions " +
        "spelled per porting rules; >= 5 on a digit is the string compare)"),
    QCase("groupby_multi_single_reducer.q", "gms2",
      """SELECT substr(key, 1, 1) AS k,
        |  count(DISTINCT substr(value, 5)) AS c1,
        |  sum(DISTINCT CAST(substr(value, 5) AS DOUBLE)) AS c2,
        |  count(value) AS c3
        |FROM qt_src WHERE substr(key, 1, 1) < '5'
        |GROUP BY substr(key, 1, 1)""".stripMargin),
    QCase("groupby_multi_single_reducer.q", "gms3",
      """SELECT substr(key, 1, 1) AS k,
        |  count(DISTINCT substr(value, 5)) AS c1,
        |  sum(DISTINCT CAST(substr(value, 5) AS DOUBLE)) AS c2,
        |  count(value) AS c3
        |FROM qt_src GROUP BY substr(key, 1, 1)""".stripMargin))

  test("qtest conformance: limit pushdown, Hive's LIMIT offset,count " +
      "form, multi-distinct single-reducer aggregates") {
    run("limit_pushdown", "offset_limit", "groupby_multi_single_reducer")
  }

  test("comma-limit tail inside a trailing comment of an invalid " +
      "statement surfaces the ORIGINAL parse error, not a rewritten one") {
    val e = intercept[Exception] {
      graft.Engine.sql(spark, sfDir, "SELECT x FRO t -- limit 1, 2")
    }
    // the error text must be about the user's statement (FRO typo), not
    // about an OFFSET rewrite of its comment
    assert(!e.getMessage.toUpperCase.contains("OFFSET"), e.getMessage)
  }
}
