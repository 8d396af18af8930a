package graft.queries

import org.apache.spark.sql.functions._
import graft.Engine
import graft.plans.Snapshots
import QDef.q

/** Snapshot-table (versioned manifest log) queries: each builds a scratch
  * snapshot table from the immutable input parquet, runs versioned DML
  * against it, and reads a snapshot whose content is SQL-expressible over
  * the ORIGINAL table — so DuckDB can oracle-check time travel and COW
  * semantics without understanding the log format.
  */
object SnapshotQueries {

  private def scratch(): String =
    java.nio.file.Files.createTempDirectory("graft_snapq_").toString + "/t"

  val defs: Seq[QDef] = Seq(

    // Time travel: after a DELETE and an APPEND, version 0 must still read
    // as the pristine table — the oracle aggregates the original parquet.
    q("s01_snapshot_time_travel",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val orders = Engine.table(spark, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      val t = Snapshots.create(spark, scratch(), orders)
      t.deleteWhere($"o_orderstatus" === "F")
      t.append(orders.limit(100).withColumn("o_orderkey",
        $"o_orderkey" + 500000000L))
      t.readVersion(0)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), Exact.dsum($"o_totalprice").as("total"))
        .orderBy($"o_orderstatus")
    },

    // Current state after file-granularity COW DELETE + UPDATE — the oracle
    // replays the same statements relationally over the original table.
    q("s02_snapshot_cow_state",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(CASE WHEN o_orderstatus = 'P' THEN 0.0
        |                     ELSE o_totalprice END AS DECIMAL(25,2)))
        |    AS DOUBLE) AS total
        |FROM orders WHERE o_orderkey % 7 <> 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val orders = Engine.table(spark, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      val t = Snapshots.create(spark, scratch(), orders)
      t.deleteWhere($"o_orderkey" % 7 === 0)
      t.updateWhere($"o_orderstatus" === "P", Map("o_totalprice" -> lit(0.0)))
      t.read()
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), Exact.dsum($"o_totalprice").as("total"))
        .orderBy($"o_orderstatus")
    })
}
