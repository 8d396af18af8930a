package graft

import org.apache.spark.sql.SparkSession

/** Manual check: the spark.sql.extensions deployment path registers the
  * function surface without any explicit Engine call (fresh JVM via
  * Test/runMain).
  */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val catalogDir = java.nio.file.Files
      .createTempDirectory("graft_extchk_cat_").toString
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.graft.catalog", catalogDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val v = spark.sql("SELECT field('b', 'a', 'b') AS f, mask_first_n('Abcd1234') AS m")
      .head()
    assert(v.getInt(0) == 2 && v.getString(1) == "Xxxx1234")
    // Hive's ORDERLESS ranking windows resolve via the injected rule
    val ow = spark.sql("SELECT rank() OVER () AS r, " +
      "row_number() OVER () AS rn FROM VALUES (1), (2) t(a)")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._2)
    assert(ow.toSeq == Seq((1, 1), (1, 2)), s"orderless windows: ${ow.toSeq}")
    // catalog-name snapshot tables resolve in plain spark.sql via the
    // injected analyzer rule (incl. time travel), with zero Engine calls
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_extchk_")
      .toString + "/t"
    graft.plans.Snapshots.create(spark, root,
      (0 until 20).map(i => (i.toLong, s"r$i")).toDF("id", "s"))
    graft.plans.NamedTables.registerSnapshot("extchk", root)
    graft.plans.Snapshots.table(spark, root)
      .deleteWhere(org.apache.spark.sql.functions.col("id") < 5)
    val n = spark.sql("SELECT count(*) AS n FROM extchk").head().getLong(0)
    val n0 = spark.sql("SELECT count(*) AS n FROM extchk VERSION AS OF 0")
      .head().getLong(0)
    assert(n == 15 && n0 == 20, s"named snapshot reads: n=$n n0=$n0")
    // restarted-JVM phase: forget all in-memory state (what a process death
    // leaves behind), start a fresh extensions-bootstrapped session with the
    // same spark.graft.catalog, and resolve the name with no re-CREATE —
    // the durable registry alone must serve it
    spark.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    graft.plans.NamedTables.resetForTest()
    val spark2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.graft.catalog", catalogDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val n2 = spark2.sql("SELECT count(*) AS n FROM extchk").head().getLong(0)
    assert(n2 == 15, s"restarted-JVM named read: n=$n2")
    graft.plans.NamedTables.drop("extchk")
    println(s"extensions-path OK: field=${v.getInt(0)} mask=${v.getString(1)} " +
      s"named=$n timeTravel=$n0 restarted=$n2")
    spark2.stop()
  }
}
