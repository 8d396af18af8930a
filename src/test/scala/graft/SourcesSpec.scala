package graft

import org.apache.spark.sql.functions._

/** SURVEY §2.2 source/sink formats: every built-in format the reference's
  * capability class needs round-trips with schema and values intact (ORC with
  * predicate pushdown, CSV with header+inferSchema, JSON lines, text with
  * skip-header-style filtering). Avro requires the external spark-avro module
  * (absent in this container) — documented substitution.
  */
class SourcesSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft_src_").toString + "/" + name

  private lazy val sample = Engine.table(spark, sfDir, "part")

  test("orc round-trip with predicate pushdown") {
    import spark.implicits._
    val dir = tmp("orc")
    sample.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === sample.count())
    assert(back.schema === sample.schema)
    val plan = back.filter($"p_size" > 30).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(p_size), GreaterThan(p_size,30)"))
    assert(back.filter($"p_size" > 30).count() ===
      sample.filter($"p_size" > 30).count())
  }

  test("csv round-trip with header and schema inference") {
    import spark.implicits._
    val dir = tmp("csv")
    sample.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() === sample.count())
    assert(back.schema("p_size").dataType.typeName === "integer")
    assert(math.abs(back.agg(sum($"p_retailprice")).head().getDouble(0) -
      sample.agg(sum($"p_retailprice")).head().getDouble(0)) < 1e-4)
  }

  test("json lines round-trip") {
    import spark.implicits._
    val dir = tmp("json")
    sample.write.json(dir)
    val back = spark.read.json(dir)
    assert(back.count() === sample.count())
    assert(back.select(countDistinct($"p_brand")).head().getLong(0) ===
      sample.select(countDistinct($"p_brand")).head().getLong(0))
  }

  test("text source with header skipping and regex parsing") {
    import spark.implicits._
    val dir = tmp("text")
    val lines = Seq("# header to skip") ++
      (1 to 5).map(i => s"row$i|${i * 10}")
    lines.toDF("value").coalesce(1).write.text(dir)
    val parsed = spark.read.text(dir)
      .filter(!$"value".startsWith("#")) // skip-header analog
      .select(
        regexp_extract($"value", "^(\\w+)\\|(\\d+)$", 1).as("name"),
        regexp_extract($"value", "^(\\w+)\\|(\\d+)$", 2).cast("int").as("v"))
    assert(parsed.count() === 5)
    assert(parsed.agg(sum($"v")).head().getLong(0) === 150L)
  }

  test("sequencefile round-trip via the RDD bridge (HiveSequenceFileInputFormat analog)") {
    import spark.implicits._
    val dir = tmp("seq")
    // write (key=p_partkey, value=p_name) as a Hadoop SequenceFile
    sample.select($"p_partkey", $"p_name").limit(50)
      .rdd.map(r => (r.getLong(0), r.getString(1)))
      .saveAsSequenceFile(dir)
    val back = spark.sparkContext
      .sequenceFile[Long, String](dir)
      .toDF("p_partkey", "p_name")
    assert(back.count() === 50)
    val orig = sample.select($"p_partkey", $"p_name").limit(50)
      .as[(Long, String)].collect().toMap
    assert(back.as[(Long, String)].collect().toMap === orig)
  }

  test("schema merging across evolving parquet files") {
    import spark.implicits._
    val dir = tmp("merge")
    Seq((1L, "a")).toDF("id", "s").write.parquet(dir + "/p=1")
    Seq((2L, "b", 9.9)).toDF("id", "s", "extra").write.parquet(dir + "/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "s", "extra", "p"))
    assert(merged.filter($"extra".isNull).count() === 1)
  }
}
