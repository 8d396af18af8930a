package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement harness (not part of the engine; deleted before
  * round close).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.configure(spark)
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    import org.apache.spark.sql.Column

    // half-up nearest-integer of c*100 as a long, arithmetic only
    def cents(c: Column): Column =
      when(c >= 0, floor(c * 100 + 0.5)).otherwise(-floor(-(c * 100) + 0.5))
        .cast("long")

    val checks: Seq[(String, String, Column => Column)] = Seq(
      ("lineitem", "l_quantity", identity),
      ("lineitem", "l_extendedprice", identity),
      ("lineitem", "l_discount", identity),
      ("lineitem", "l_tax", identity),
      ("lineitem", "l_discount_1m", c => lit(1) - c),
      ("lineitem", "l_tax_1p", c => lit(1) + c),
      ("orders", "o_totalprice", identity),
      ("events", "value", identity),
      ("customer", "c_acctbal", identity),
      ("supplier", "s_acctbal", identity),
      ("part", "p_retailprice", identity))
    checks.foreach { case (tbl, colName0, f) =>
      val colName = colName0.stripSuffix("_1m").stripSuffix("_1p")
      val df = Engine.table(spark, sfDir, tbl)
      val c = f(col(colName))
      val bad25 = df.filter(
        cents(c) =!= (c.cast(DecimalType(25, 2)) * 100).cast("long")).count()
      val bad8 = df.filter(
        cents(c) =!= (c.cast(DecimalType(8, 2)) * 100).cast("long")).count()
      println(s"[scratch] $tbl.$colName0 mismatch25=$bad25 mismatch8=$bad8")
    }
    // diff of two 2dp columns (q11's davg input)
    val sc = Engine.table(spark, sfDir, "supplier").select($"s_acctbal", $"s_nationkey")
      .join(Engine.table(spark, sfDir, "customer").select($"c_acctbal", $"c_nationkey"),
        $"s_nationkey" === $"c_nationkey" && $"s_acctbal" > $"c_acctbal")
    val d = $"s_acctbal" - $"c_acctbal"
    val badDiff = sc.filter(
      cents(d) =!= (d.cast(DecimalType(25, 2)) * 100).cast("long")).count()
    println(s"[scratch] s_acctbal-c_acctbal mismatch=$badDiff")
    spark.stop()
  }
}
