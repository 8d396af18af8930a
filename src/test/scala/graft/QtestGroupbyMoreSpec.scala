package graft

import org.apache.spark.sql.functions.{col, count, countDistinct, sum, sum_distinct, substring}

/** Conformance wave 16f: the groupby* remainder — ref ql/src/test/
  * queries/clientpositive/groupby_duplicate_key.q, groupby13.q,
  * groupby_position.q, groupby10.q (kv5.txt fixture),
  * groupby2_map_multi_distinct.q shapes.
  */
class QtestGroupbyMoreSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    // duplicate constant columns under DISTINCT dedup as one key
    QCase("groupby_duplicate_key.q", "g01",
      "select distinct key, '' AS dummy1, '' AS dummy2 from qt_src " +
        "where cast(key as int) < 20"),

    QCase("groupby_duplicate_key.q", "g02",
      "select max('pants') AS a, max('pANTS') AS b from qt_src " +
        "group by key order by key limit 1",
      ordered = true),

    // duplicate GROUP BY expressions are legal and collapse (groupby13)
    QCase("groupby13.q", "g03",
      "select key, max(least(coalesce(length(value), -279), " +
        "coalesce(cast(key as int), 476))) AS m from qt_src " +
        "group by key, key, least(coalesce(length(value), -279), " +
        "coalesce(cast(key as int), 476))"),

    // multi-distinct aggregates in one grouping (groupby2/3 _multi_distinct)
    QCase("groupby2_map_multi_distinct.q", "g04",
      "select substr(key, 1, 1) AS k, count(distinct substr(value, 5)) AS c, " +
        "sum(cast(substr(value, 5) as int)) AS s, " +
        "sum(distinct cast(substr(value, 5) as int)) AS sd " +
        "from qt_src group by substr(key, 1, 1)",
      duck = Some("select substr(key, 1, 1) AS k, " +
        "count(distinct substr(value, 5)) AS c, " +
        "sum(cast(substr(value, 5) as int)) AS s, " +
        "sum(distinct cast(substr(value, 5) as int)) AS sd " +
        "from qt_src group by substr(key, 1, 1)")),

    // position aliases in GROUP BY inside a subquery + ORDER BY positions
    QCase("groupby_position.q", "g05",
      "select t.key AS k, t.value AS v " +
        "from (select b.key as key, count(1) as value from qt_src b " +
        "      where b.key <= 20 group by 1) t " +
        "order by 2 desc, 1 asc",
      duck = Some("select t.key AS k, t.value AS v " +
        "from (select b.key as key, count(1) as value from qt_src b " +
        "      where cast(b.key as int) <= 20 group by 1) t " +
        "order by 2 desc, 1 asc"),
      ordered = true,
      note = "Hive coerces string<=int comparisons through double; the " +
        "DuckDB twin spells the cast"))

  test("qtest conformance: groupby remainder (duplicate keys, " +
      "multi-distinct, position aliases)") {
    run("groupby")
  }

  test("groupby_position.q: position aliases drive both GROUP BY lists " +
      "of a multi-insert, including the swapped 2,1 spelling") {
    assume(QtestHarness.haveRef); QtestHarness.fixtures
    Engine.sql(spark, sfDir, "DROP TABLE IF EXISTS testTable1")
    Engine.sql(spark, sfDir, "DROP TABLE IF EXISTS testTable2")
    try {
      Engine.sql(spark, sfDir,
        "CREATE TABLE testTable1(key INT, value STRING)")
      Engine.sql(spark, sfDir,
        "CREATE TABLE testTable2(key INT, val1 STRING, val2 STRING)")
      Engine.sql(spark, sfDir,
        """FROM qt_src
          |INSERT OVERWRITE TABLE testTable1 SELECT qt_src.key, COUNT(DISTINCT SUBSTR(qt_src.value,5)) WHERE qt_src.key < 20 GROUP BY 1
          |INSERT OVERWRITE TABLE testTable2 SELECT qt_src.key, qt_src.value, COUNT(DISTINCT SUBSTR(qt_src.value,5)) WHERE qt_src.key < 20 GROUP BY 2, 1"""
          .stripMargin)
      // independent derivation of both destinations
      val src = spark.table("qt_src").where(col("key") < 20)
      val want1 = src.groupBy(col("key"))
        .agg(countDistinct(substring(col("value"), 5, 1000)))
        .collect().map(r => (r.getString(0).toInt, r.getLong(1))).sorted
      val got1 = spark.table("testTable1").collect()
        .map(r => (r.getInt(0), r.getString(1).toLong)).sorted
      assert(got1.toSeq === want1.toSeq)
      val want2 = src.groupBy(col("value"), col("key"))
        .agg(countDistinct(substring(col("value"), 5, 1000)))
        .collect()
        .map(r => (r.getString(1).toInt, r.getString(0), r.getLong(2)))
        .sorted
      val got2 = spark.table("testTable2").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2).toLong))
        .sorted
      assert(got2.toSeq === want2.toSeq)
    } finally {
      Engine.sql(spark, sfDir, "DROP TABLE IF EXISTS testTable1")
      Engine.sql(spark, sfDir, "DROP TABLE IF EXISTS testTable2")
    }
  }

  test("groupby10.q: one source fans into two destinations with " +
      "count/count-distinct and sum/sum-distinct aggregations (kv5)") {
    assume(QtestHarness.haveRef); QtestHarness.fixtures
    val kv5 = spark.read.option("sep", "")
      .csv(QtestHarness.refData + "/kv5.txt").toDF("key", "value")
      .select(col("key").cast("int").as("key"), col("value"))
    kv5.createOrReplaceTempView("qt_kv5")
    Engine.sql(spark, sfDir, "DROP TABLE IF EXISTS gb10_dest1")
    Engine.sql(spark, sfDir, "DROP TABLE IF EXISTS gb10_dest2")
    try {
      Engine.sql(spark, sfDir,
        "CREATE TABLE gb10_dest1(key INT, val1 INT, val2 INT)")
      Engine.sql(spark, sfDir,
        "CREATE TABLE gb10_dest2(key INT, val1 INT, val2 INT)")
      Engine.sql(spark, sfDir,
        """FROM qt_kv5
          |INSERT OVERWRITE TABLE gb10_dest1 SELECT qt_kv5.key, count(substr(qt_kv5.value,5)), count(distinct substr(qt_kv5.value,5)) GROUP BY qt_kv5.key
          |INSERT OVERWRITE TABLE gb10_dest2 SELECT qt_kv5.key, sum(substr(qt_kv5.value,5)), sum(distinct substr(qt_kv5.value,5)) GROUP BY qt_kv5.key"""
          .stripMargin)
      val sub = kv5.select(col("key"),
        substring(col("value"), 5, 1000).cast("int").as("v"))
      val want1 = sub.groupBy(col("key"))
        .agg(count(col("v")), countDistinct(col("v"))).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
      val got1 = spark.table("gb10_dest1").collect()
        .map(r => (r.getInt(0), r.getInt(1).toLong, r.getInt(2).toLong))
        .sorted
      assert(got1.toSeq === want1.toSeq)
      val want2 = sub.groupBy(col("key"))
        .agg(sum(col("v")), sum_distinct(col("v"))).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
      val got2 = spark.table("gb10_dest2").collect()
        .map(r => (r.getInt(0), r.getInt(1).toLong, r.getInt(2).toLong))
        .sorted
      assert(got2.toSeq === want2.toSeq)
    } finally {
      Engine.sql(spark, sfDir, "DROP TABLE IF EXISTS gb10_dest1")
      Engine.sql(spark, sfDir, "DROP TABLE IF EXISTS gb10_dest2")
    }
  }
}
