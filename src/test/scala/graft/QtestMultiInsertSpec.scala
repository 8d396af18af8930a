package graft

import org.apache.spark.sql.functions._

/** Conformance wave: the reference's `input1x.q` MULTI-INSERT forms —
  * one FROM feeding several INSERT branches with independent filters,
  * projections, a static-partition target and an OVERWRITE DIRECTORY
  * sink (ref ql/src/test/queries/clientpositive/input11.q, input12.q,
  * input13.q, input14.q). Each destination's contents compare against
  * the equivalent standalone SELECT over the same fixture (the .q.out
  * rows ARE that select's rows — hundreds of them, so the oracle is
  * computed, not transcribed).
  */
class QtestMultiInsertSpec extends SparkSpec {

  import QtestHarness.haveRef

  private def rows(sql: String): Seq[String] =
    Engine.sql(spark, sfDir, sql).collect()
      .map(_.toSeq.map(String.valueOf(_)).mkString("\t")).sorted.toSeq

  private def freshDb(): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS qmi")
    spark.catalog.setCurrentDatabase("qmi")
  }

  test("input12.q: three-branch multi-insert with a static-partition " +
      "target routes each row set to its destination") {
    assume(haveRef); QtestHarness.fixtures
    freshDb()
    try {
      spark.sql("DROP TABLE IF EXISTS dest1_n122")
      spark.sql("DROP TABLE IF EXISTS dest2_n32")
      spark.sql("DROP TABLE IF EXISTS dest3_n5")
      spark.sql("CREATE TABLE dest1_n122(key INT, value STRING) USING parquet")
      spark.sql("CREATE TABLE dest2_n32(key INT, value STRING) USING parquet")
      spark.sql("CREATE TABLE dest3_n5(key INT) USING parquet PARTITIONED BY " +
        "(ds STRING, hr STRING)")
      Engine.sql(spark, sfDir,
        """FROM qt_src src
          |INSERT OVERWRITE TABLE dest1_n122 SELECT src.* WHERE src.key < 100
          |INSERT OVERWRITE TABLE dest2_n32 SELECT src.key, src.value WHERE src.key >= 100 and src.key < 200
          |INSERT OVERWRITE TABLE dest3_n5 PARTITION(ds='2008-04-08', hr='12') SELECT src.key WHERE src.key >= 200"""
          .stripMargin)
      assert(rows("SELECT * FROM dest1_n122") ===
        rows("SELECT CAST(key AS INT), value FROM qt_src WHERE key < 100"))
      assert(rows("SELECT * FROM dest2_n32") ===
        rows("SELECT CAST(key AS INT), value FROM qt_src " +
          "WHERE key >= 100 and key < 200"))
      assert(rows("SELECT * FROM dest3_n5") ===
        rows("SELECT CAST(key AS INT), '2008-04-08', '12' FROM qt_src " +
          "WHERE key >= 200"))
      // OVERWRITE means overwrite: a second run must not double rows
      Engine.sql(spark, sfDir,
        """FROM qt_src src
          |INSERT OVERWRITE TABLE dest1_n122 SELECT src.* WHERE src.key < 100
          |INSERT OVERWRITE TABLE dest2_n32 SELECT src.key, src.value WHERE src.key >= 100 and src.key < 200
          |INSERT OVERWRITE TABLE dest3_n5 PARTITION(ds='2008-04-08', hr='12') SELECT src.key WHERE src.key >= 200"""
          .stripMargin)
      assert(rows("SELECT * FROM dest1_n122").size ===
        spark.table("qt_src").where(col("key") < 100).count().toInt)
    } finally spark.catalog.setCurrentDatabase("default")
  }

  test("input13.q: multi-insert with an INSERT OVERWRITE DIRECTORY " +
      "branch lands the fourth row set as files") {
    assume(haveRef); QtestHarness.fixtures
    freshDb()
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_mi_")
        .toString + "/dest4.out"
      spark.sql("DROP TABLE IF EXISTS dest1_n77")
      spark.sql("DROP TABLE IF EXISTS dest2_n16")
      spark.sql("CREATE TABLE dest1_n77(key INT, value STRING) USING parquet")
      spark.sql("CREATE TABLE dest2_n16(key INT, value STRING) USING parquet")
      Engine.sql(spark, sfDir,
        s"""FROM qt_src src
           |INSERT OVERWRITE TABLE dest1_n77 SELECT src.* WHERE src.key < 100
           |INSERT OVERWRITE TABLE dest2_n16 SELECT src.key, src.value WHERE src.key >= 100 and src.key < 200
           |INSERT OVERWRITE DIRECTORY '$dir' USING parquet SELECT src.value WHERE src.key >= 300"""
          .stripMargin)
      assert(rows("SELECT * FROM dest1_n77") ===
        rows("SELECT CAST(key AS INT), value FROM qt_src WHERE key < 100"))
      val dest4 = spark.read.parquet(dir).collect().map(_.getString(0))
        .sorted.toSeq
      assert(dest4 === spark.table("qt_src").where(col("key") >= 300)
        .select("value").collect().map(_.getString(0)).sorted.toSeq)
      assert(dest4.nonEmpty)
    } finally spark.catalog.setCurrentDatabase("default")
  }

  test("input14.q: a TRANSFORM ... CLUSTER BY subquery feeds an insert " +
      "branch (script operator inside multi-insert's FROM)") {
    assume(haveRef); QtestHarness.fixtures
    freshDb()
    try {
      spark.sql("DROP TABLE IF EXISTS dest1_n42")
      spark.sql("CREATE TABLE dest1_n42(key INT, value STRING) USING parquet")
      Engine.sql(spark, sfDir,
        """FROM (
          |  FROM qt_src src
          |  SELECT TRANSFORM(src.key, src.value)
          |         USING 'cat' AS (tkey, tvalue)
          |  CLUSTER BY tkey
          |) tmap
          |INSERT OVERWRITE TABLE dest1_n42 SELECT tmap.tkey, tmap.tvalue WHERE tmap.tkey < 100"""
          .stripMargin)
      assert(rows("SELECT * FROM dest1_n42") ===
        rows("SELECT CAST(key AS INT), value FROM qt_src WHERE key < 100"))
    } finally spark.catalog.setCurrentDatabase("default")
  }
}
