package graft

import org.apache.spark.sql.SparkSession

/** Manual check: the spark.sql.extensions deployment path registers the
  * function surface without any explicit Engine call (fresh JVM via
  * Test/runMain).
  */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val v = spark.sql("SELECT field('b', 'a', 'b') AS f, mask_first_n('Abcd1234') AS m")
      .head()
    assert(v.getInt(0) == 2 && v.getString(1) == "Xxxx1234")
    println(s"extensions-path OK: field=${v.getInt(0)} mask=${v.getString(1)}")
    spark.stop()
  }
}
