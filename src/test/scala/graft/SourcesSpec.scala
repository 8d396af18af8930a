package graft

import org.apache.spark.sql.functions._

/** SURVEY §2.2 source/sink formats: every built-in format the reference's
  * capability class needs round-trips with schema and values intact (ORC with
  * predicate pushdown, CSV with header+inferSchema, JSON lines, text with
  * skip-header-style filtering, Avro via the Hadoop RDD bridge — the
  * spark-avro datasource module is absent in this container, avro-mapred is
  * not — plus JDBC federation against embedded Derby).
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

  test("avro round-trip via the Hadoop RDD bridge (AvroSerDe analog)") {
    import spark.implicits._
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.generic.{GenericData, GenericRecord}
    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
    import org.apache.hadoop.io.NullWritable
    val schemaJson = SchemaBuilder.record("part").fields()
      .requiredLong("p_partkey").requiredString("p_name").requiredInt("p_size")
      .endRecord().toString
    val dir = tmp("avro")
    val src = sample.select($"p_partkey", $"p_name", $"p_size").limit(50)
    val rdd = src.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      it.map { r =>
        val rec = new GenericData.Record(schema)
        rec.put("p_partkey", r.getLong(0))
        rec.put("p_name", r.getString(1))
        rec.put("p_size", r.getInt(2))
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }
    val job = org.apache.hadoop.mapreduce.Job
      .getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    rdd.saveAsNewAPIHadoopFile(dir, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
    val back = spark.sparkContext.newAPIHadoopFile(dir,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable])
      // extract before the record reader reuses the datum object
      .map { case (k, _) => (k.datum.get("p_partkey").asInstanceOf[Long],
        k.datum.get("p_name").toString, k.datum.get("p_size").asInstanceOf[Int]) }
      .toDF("p_partkey", "p_name", "p_size")
    assert(back.count() === 50)
    assert(back.as[(Long, String, Int)].collect().toSet ===
      src.as[(Long, String, Int)].collect().toSet)
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

  test("RegexSerDe analog: capture groups become columns, non-matches go NULL") {
    import spark.implicits._
    val dir = tmp("regexserde")
    Seq("alice 30 12.50", "bob 41 7.25", "not a valid line")
      .toDF("value").coalesce(1).write.text(dir)
    val df = graft.sources.TextFormats.readRegex(spark, dir,
      "^(\\w+) (\\d+) (\\d+\\.\\d+)$", Seq("name", "age", "rate"))
    assert(df.columns.toSeq === Seq("name", "age", "rate"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows.contains(("alice", "30")))
    assert(rows.contains((null, null))) // RegexSerDe NULLs non-matching rows
    assert(df.filter($"name".isNull).count() === 1)
  }

  test("MultiDelimitSerDe analog: multi-char delimiter, lazy missing fields") {
    import spark.implicits._
    val dir = tmp("multidelim")
    Seq("a||1||x", "b||2", "c||3||y||extra").toDF("value")
      .coalesce(1).write.text(dir)
    val df = graft.sources.TextFormats.readMultiDelim(spark, dir, "||",
      Seq("k", "n", "tag"))
    val byK = df.collect().map(r =>
      r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(byK("a") === ("1", "x"))
    assert(byK("b") === ("2", null)) // missing trailing field reads NULL
    assert(byK("c") === ("3", "y")) // extra field ignored
  }

  test("per-file header/footer skipping (SkippingTextInputFormat analog)") {
    import spark.implicits._
    val dir = tmp("skiptext")
    // two files, each with its own 2-line header and 1-line footer
    Seq(Seq("h1", "h2", "f1-data1", "f1-data2", "trailer"),
      Seq("h1", "h2", "f2-data1", "trailer")).zipWithIndex.foreach {
      case (ls, i) => ls.toDF("value").coalesce(1).write.text(s"$dir/part$i")
    }
    val df = graft.sources.TextFormats.readSkipping(
      spark, s"$dir/part*", skipHeader = 2, skipFooter = 1)
    assert(df.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("f1-data1", "f1-data2", "f2-data1"))
    // footer bigger than the file yields nothing rather than wrapping
    val none = graft.sources.TextFormats.readSkipping(
      spark, s"$dir/part1", skipHeader = 2, skipFooter = 5)
    assert(none.count() === 0)
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

  // JDBC federation (SURVEY §2.2 row 33) against embedded Derby — the same
  // format("jdbc") path works for any DriverManager-visible database.
  private val derbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"
  private def derbyUrl(name: String): String = {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby_").toString
    s"jdbc:derby:$dbDir/$name;create=true"
  }

  test("jdbc read with predicate pushdown into the remote query") {
    import spark.implicits._
    val url = derbyUrl("pushdb")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE regions (r_id INT NOT NULL, r_name VARCHAR(32), r_pop BIGINT)")
      val ins = conn.prepareStatement("INSERT INTO regions VALUES (?, ?, ?)")
      (1 to 50).foreach { i =>
        ins.setInt(1, i); ins.setString(2, s"region_$i"); ins.setLong(3, i * 1000L)
        ins.executeUpdate()
      }
    } finally conn.close()
    val df = graft.sources.Jdbc.read(spark, url, "regions", derbyDriver)
    assert(df.count() === 50)
    val filtered = df.filter($"R_ID" > 40).select($"R_ID", $"R_NAME")
    // the predicate reaches the remote scan (JDBCRelation PushedFilters),
    // mirroring the reference handler's FilterPushdownDecomposer
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(R_ID,40"),
      s"filter not pushed to JDBC source:\n$plan")
    assert(filtered.count() === 10)
  }

  test("jdbc partitioned read fans out range-bounded splits") {
    import spark.implicits._
    val url = derbyUrl("splitdb")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        "CREATE TABLE facts (f_id INT NOT NULL, f_val DOUBLE)")
      val ins = conn.prepareStatement("INSERT INTO facts VALUES (?, ?)")
      (1 to 200).foreach { i => ins.setInt(1, i); ins.setDouble(2, i * 0.5); ins.executeUpdate() }
    } finally conn.close()
    val df = graft.sources.Jdbc.readPartitioned(spark, url, "facts", derbyDriver,
      partitionColumn = "f_id", lowerBound = 1L, upperBound = 201L, numPartitions = 4)
    // split generation: 4 concurrent range queries (the JdbcInputFormat
    // getSplits analog), together covering every row exactly once
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 200)
    assert(df.agg(sum($"F_ID")).head().getLong(0) === (1 to 200).sum.toLong)
  }

  test("jdbc write round-trip and federation join with parquet") {
    import spark.implicits._
    val url = derbyUrl("feddb")
    // write a Spark-side dimension out to the RDBMS...
    val dim = Engine.table(spark, sfDir, "region")
      .select($"r_regionkey".cast("int").as("rk"), $"r_name".as("rname"))
    graft.sources.Jdbc.write(dim, url, "dims", derbyDriver)
    // ...read it back and federate: JDBC dim joined to a parquet fact table
    val back = graft.sources.Jdbc.read(spark, url, "dims", derbyDriver)
    assert(back.count() === 5)
    val joined = Engine.table(spark, sfDir, "nation")
      .join(broadcast(back), $"n_regionkey" === $"RK")
      .groupBy($"RNAME").agg(count(lit(1)).as("n_nations"))
    assert(joined.count() === 5)
    assert(joined.agg(sum($"n_nations")).head().getLong(0) === 25L)
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
