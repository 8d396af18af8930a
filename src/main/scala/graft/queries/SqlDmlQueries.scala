package graft.queries

import org.apache.spark.sql.functions._
import graft.Engine
import graft.plans.{NamedTables, Snapshots}
import QDef.q

/** SQL-statement DML under the correctness gate: UPDATE / DELETE / MERGE /
  * INSERT as SQL text through [[Engine.sql]] (the reference's primary DML
  * surface — ref ql/src/java/org/apache/hadoop/hive/ql/parse/
  * UpdateDeleteSemanticAnalyzer.java, MergeSemanticAnalyzer.java:46),
  * against both a plain parquet path table (COW) and a catalog-named
  * snapshot table. Results are read back relationally so DuckDB can replay
  * the statements as plain SELECTs.
  */
object SqlDmlQueries {

  private def scratch(): String =
    java.nio.file.Files.createTempDirectory("graft_sqldmlq_").toString + "/t"

  val defs: Seq[QDef] = Seq(

    // SQL UPDATE + DELETE over a parquet path table (copy-on-write); the
    // oracle replays both statements as WHERE + CASE over the original.
    q("s10_sql_dml_cow",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(CASE WHEN o_orderstatus = 'O' THEN 1.0
        |                     ELSE o_totalprice END AS DECIMAL(25,2)))
        |    AS DOUBLE) AS total
        |FROM orders WHERE o_orderkey % 11 <> 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val path = scratch()
      Engine.table(spark, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .write.parquet(path)
      Engine.sql(spark, dir,
        s"UPDATE parquet.`$path` SET o_totalprice = 1.0 WHERE o_orderstatus = 'O'")
      Engine.sql(spark, dir,
        s"DELETE FROM parquet.`$path` WHERE o_orderkey % 11 = 0")
      spark.read.parquet(path)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), Exact.dsum($"o_totalprice").as("total"))
        .orderBy($"o_orderstatus")
    },

    // SQL MERGE into a catalog-NAMED snapshot table (matched rows update,
    // unmatched insert), read back through the name in plain SQL — both the
    // statement surface and name resolution under the gate.
    q("s11_sql_merge_named",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 50 = 0 THEN 2.0 ELSE o_totalprice END AS o_totalprice
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 800000000, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 499 = 0
        |) GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val orders = Engine.table(spark, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      NamedTables.registerSnapshot("s11_sales",
        Snapshots.create(spark, scratch(), orders).root)
      orders.filter($"o_orderkey" % 50 === 0)
        .withColumn("o_totalprice", lit(2.0))
        .unionByName(orders.filter($"o_orderkey" % 499 === 0)
          .withColumn("o_orderkey", $"o_orderkey" + 800000000L))
        .createOrReplaceTempView("s11_src")
      Engine.sql(spark, dir,
        """MERGE INTO s11_sales t USING s11_src s ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
          |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, o_totalprice)
          |  VALUES (s.o_orderkey, s.o_orderstatus, s.o_totalprice)""".stripMargin)
      Engine.sql(spark, dir,
        """SELECT o_orderstatus, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
          |FROM s11_sales GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    },

    // The full SQL lifecycle: CTAS creates a named snapshot table, DML
    // mutates it, and the read joins the current state against VERSION AS
    // OF 0 time travel — all statements SQL text, no programmatic API.
    q("s13_sql_time_travel",
      """SELECT cur.o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(cur.o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM (SELECT * FROM orders WHERE o_orderkey % 6 <> 0) cur
        |JOIN orders v0 ON cur.o_orderkey = v0.o_orderkey
        |GROUP BY cur.o_orderstatus ORDER BY cur.o_orderstatus""".stripMargin) { (spark, dir) =>
      val root = scratch()
      NamedTables.drop("s13_t") // rerunnable: the name, not the scratch root
      Engine.sql(spark, dir,
        s"""CREATE TABLE s13_t USING snapshot LOCATION '$root'
           |AS SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders""".stripMargin)
      Engine.sql(spark, dir, "DELETE FROM s13_t WHERE o_orderkey % 6 = 0")
      Engine.sql(spark, dir,
        """SELECT cur.o_orderstatus, count(*) AS n,
          |  CAST(sum(CAST(cur.o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
          |FROM s13_t cur
          |JOIN s13_t VERSION AS OF 0 v0 ON cur.o_orderkey = v0.o_orderkey
          |GROUP BY cur.o_orderstatus ORDER BY cur.o_orderstatus""".stripMargin)
    },

    // Multi-arm MERGE: ordered conditional WHEN MATCHED arms (delete /
    // zero-out / touch) plus WHEN NOT MATCHED BY SOURCE aging — the oracle
    // replays arm selection as CASE over the same predicates.
    q("s14_sql_merge_arms",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 10 <> 0 AND o_orderstatus = 'P' THEN 'X'
        |         ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 10 = 0 AND o_orderstatus <> 'F' THEN 1.0
        |         WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders
        |) GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val orders = Engine.table(spark, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      NamedTables.drop("s14_t")
      NamedTables.registerSnapshot("s14_t",
        Snapshots.create(spark, scratch(), orders).root)
      orders.filter($"o_orderkey" % 10 === 0)
        .select($"o_orderkey".as("k"), $"o_totalprice".as("p"))
        .createOrReplaceTempView("s14_src")
      // matched F-status rows bump price; other matched rows zero then bump
      // is ORDER-dependent: first arm wins. Unmatched-by-source P rows age
      // to status X; everything else untouched.
      Engine.sql(spark, dir,
        """MERGE INTO s14_t t USING s14_src s ON t.o_orderkey = s.k
          |WHEN MATCHED AND t.o_orderstatus <> 'F'
          |  THEN UPDATE SET o_totalprice = 1.0
          |WHEN MATCHED THEN UPDATE SET o_totalprice = t.o_totalprice + 1.0
          |WHEN NOT MATCHED BY SOURCE AND t.o_orderstatus = 'P'
          |  THEN UPDATE SET o_orderstatus = 'X'""".stripMargin)
      Engine.sql(spark, dir,
        """SELECT o_orderstatus, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
          |FROM s14_t GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    },

    // Merge-on-read upsert under the gate: a write.mode=merge-on-read
    // table takes a SQL MERGE (update + insert arms) as sidecar + appended
    // images; the oracle replays the upsert relationally — results must be
    // indistinguishable from the COW path.
    q("s15_sql_mor_upsert",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 40 = 0 THEN 3.0 ELSE o_totalprice END AS o_totalprice
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 850000000, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 397 = 0
        |) GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val orders = Engine.table(spark, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      NamedTables.drop("s15_t")
      NamedTables.registerSnapshot("s15_t",
        Snapshots.create(spark, scratch(), orders).root, NamedTables.WriteMor)
      orders.filter($"o_orderkey" % 40 === 0)
        .withColumn("o_totalprice", lit(3.0))
        .unionByName(orders.filter($"o_orderkey" % 397 === 0)
          .withColumn("o_orderkey", $"o_orderkey" + 850000000L))
        .createOrReplaceTempView("s15_src")
      Engine.sql(spark, dir,
        """MERGE INTO s15_t t USING s15_src s ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
          |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, o_totalprice)
          |  VALUES (s.o_orderkey, s.o_orderstatus, s.o_totalprice)""".stripMargin)
      require(Snapshots.table(spark,
        NamedTables.get("s15_t").get.root).latest().action == "merge-mor",
        "the statement must take the merge-on-read path")
      Engine.sql(spark, dir,
        """SELECT o_orderstatus, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
          |FROM s15_t GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    },

    // NULL merge keys under the gate: a source row with a NULL key matches
    // nothing (SQL join semantics) and takes the INSERT arm with its own
    // values; a NULL-keyed TARGET row matches nothing either and is in
    // scope for WHEN NOT MATCHED BY SOURCE. The oracle replays both
    // relationally — count(k) pins non-NULL cardinality so a phantom
    // all-NULL row cannot hide inside count(*).
    q("s16_sql_merge_null_keys",
      """SELECT o_orderstatus, count(*) AS n, count(k) AS n_keys,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_orderkey END AS k,
        |    o_orderstatus,
        |    CASE WHEN o_orderkey % 97 = 0 THEN 0.0
        |         WHEN o_orderkey % 50 = 0 THEN 2.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey AS k, o_orderstatus, 2.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 50 = 0 AND o_orderkey % 97 = 0
        |  UNION ALL
        |  SELECT NULL AS k, o_orderstatus, 7.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 499 = 0
        |) GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val orders = Engine.table(spark, dir, "orders")
      val target = orders.select(
        when($"o_orderkey" % 97 === 0, lit(null)).otherwise($"o_orderkey").as("k"),
        $"o_orderstatus", $"o_totalprice")
      NamedTables.drop("s16_t")
      NamedTables.registerSnapshot("s16_t",
        Snapshots.create(spark, scratch(), target).root)
      orders.filter($"o_orderkey" % 50 === 0)
        .select($"o_orderkey".as("k"), $"o_orderstatus", lit(2.0).as("p"))
        .unionByName(orders.filter($"o_orderkey" % 499 === 0)
          .select(lit(null).cast("long").as("k"), $"o_orderstatus",
            lit(7.0).as("p")))
        .createOrReplaceTempView("s16_src")
      Engine.sql(spark, dir,
        """MERGE INTO s16_t t USING s16_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET o_totalprice = s.p
          |WHEN NOT MATCHED THEN INSERT (k, o_orderstatus, o_totalprice)
          |  VALUES (s.k, s.o_orderstatus, s.p)
          |WHEN NOT MATCHED BY SOURCE AND t.k IS NULL
          |  THEN UPDATE SET o_totalprice = 0.0""".stripMargin)
      Engine.sql(spark, dir,
        """SELECT o_orderstatus, count(*) AS n, count(k) AS n_keys,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
          |FROM s16_t GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    },

    // Composite-key MERGE over a plain parquet path table: the ON clause is
    // an AND-chain over the (l_orderkey, l_linenumber) business key, with
    // differently-named source columns to exercise the target/source column
    // mapping; the oracle replays the upsert relationally.
    q("s17_sql_merge_composite_key",
      """SELECT l_linenumber, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS qty
        |FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_orderkey % 14 = 0 THEN l_quantity + 100
        |         ELSE l_quantity END AS l_quantity
        |  FROM (SELECT l_orderkey, l_linenumber,
        |          CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS l_quantity
        |        FROM lineitem WHERE l_orderkey % 7 = 0 GROUP BY 1, 2)
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber + 10,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE)
        |  FROM lineitem WHERE l_orderkey % 14 = 0 GROUP BY 1, 2
        |) GROUP BY l_linenumber ORDER BY l_linenumber""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val path = scratch()
      val li = Engine.table(spark, dir, "lineitem")
      // the synthetic lineitem is TPC-H-ish, not TPC-H: (l_orderkey,
      // l_linenumber) is NOT unique, so pre-aggregate to make it a key —
      // a MERGE source with duplicate keys against a matched arm is a
      // cardinality violation by design
      def keyed(filter: org.apache.spark.sql.Column) =
        li.filter(filter).groupBy($"l_orderkey", $"l_linenumber")
          .agg(Exact.dsum($"l_quantity").as("l_quantity"))
      keyed($"l_orderkey" % 7 === 0).write.parquet(path)
      val src = keyed($"l_orderkey" % 14 === 0)
      src.select($"l_orderkey".as("ok"), $"l_linenumber".as("ln"),
          $"l_quantity".as("qty"))
        .unionByName(src.select($"l_orderkey".as("ok"),
          ($"l_linenumber" + 10).as("ln"), $"l_quantity".as("qty")))
        .createOrReplaceTempView("s17_src")
      Engine.sql(spark, dir,
        s"""MERGE INTO parquet.`$path` t USING s17_src s
           |ON t.l_orderkey = s.ok AND t.l_linenumber = s.ln
           |WHEN MATCHED THEN UPDATE SET l_quantity = t.l_quantity + 100
           |WHEN NOT MATCHED THEN INSERT (l_orderkey, l_linenumber, l_quantity)
           |  VALUES (s.ok, s.ln, s.qty)""".stripMargin)
      spark.read.parquet(path)
        .groupBy($"l_linenumber")
        .agg(count(lit(1)).as("n"), Exact.dsum($"l_quantity").as("qty"))
        .orderBy($"l_linenumber")
    },

    // SQL INSERT INTO a named snapshot table plus a SQL DELETE through the
    // same name; the oracle reconstructs the final state relationally.
    q("s12_sql_insert_named",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders WHERE o_orderkey % 13 <> 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val orders = Engine.table(spark, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus")
      NamedTables.registerSnapshot("s12_t",
        Snapshots.create(spark, scratch(),
          orders.filter($"o_orderkey" % 2 === 0)).root)
      Engine.sql(spark, dir,
        "INSERT INTO s12_t SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 1")
      Engine.sql(spark, dir, "DELETE FROM s12_t WHERE o_orderkey % 13 = 0")
      Engine.sql(spark, dir,
        """SELECT o_orderstatus, count(*) AS n,
          |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
          |FROM s12_t GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    },

    // INSERT with an explicit column list (unlisted columns fill NULL) and
    // a static PARTITION spec (the constant maps onto the partition data
    // column) — the oracle replays both as UNION ALL branches with the same
    // fills.
    q("s18_sql_insert_column_list",
      """SELECT o_orderstatus, count(*) AS n, count(o_totalprice) AS n_price,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 900000000, o_orderstatus, NULL
        |  FROM orders WHERE o_orderkey % 3 = 1
        |  UNION ALL
        |  SELECT o_orderkey + 950000000, 'Z', NULL
        |  FROM orders WHERE o_orderkey % 3 = 2
        |) GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val orders = Engine.table(spark, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      NamedTables.drop("s18_t")
      NamedTables.registerSnapshot("s18_t",
        Snapshots.create(spark, scratch(),
          orders.filter($"o_orderkey" % 3 === 0),
          partitionBy = Seq("o_orderstatus")).root)
      // column list: o_totalprice unlisted -> NULL
      Engine.sql(spark, dir,
        """INSERT INTO s18_t (o_orderkey, o_orderstatus)
          |SELECT o_orderkey + 900000000, o_orderstatus
          |FROM orders WHERE o_orderkey % 3 = 1""".stripMargin)
      // static PARTITION + column list: o_orderstatus from the spec
      Engine.sql(spark, dir,
        """INSERT INTO s18_t PARTITION (o_orderstatus = 'Z') (o_orderkey)
          |SELECT o_orderkey + 950000000
          |FROM orders WHERE o_orderkey % 3 = 2""".stripMargin)
      Engine.sql(spark, dir,
        """SELECT o_orderstatus, count(*) AS n, count(o_totalprice) AS n_price,
          |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
          |FROM s18_t GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    },

    // Schema evolution as SQL statements: RENAME COLUMN (metadata-only —
    // old files must serve the new name), UPDATE through the renamed
    // column, ADD COLUMNS (pre-evolution rows read NULL), INSERT into the
    // evolved schema, DROP COLUMN. The oracle replays the surviving
    // logical content as a SELECT over the original table.
    q("s19_sql_schema_evolution",
      """SELECT o_orderstatus, count(*) AS n, count(tag) AS n_tag,
        |  CAST(sum(CAST(CASE WHEN o_orderstatus = 'O' THEN 0.5
        |                     ELSE o_totalprice END AS DECIMAL(25,2)))
        |    AS DOUBLE) AS price_sum
        |FROM (
        |  SELECT o_orderstatus, o_totalprice, NULL AS tag
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT 'Z', 9.25, 'new' FROM orders WHERE o_orderkey % 97 = 0
        |) GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val orders = Engine.table(spark, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      NamedTables.drop("s19_t")
      NamedTables.registerSnapshot("s19_t",
        Snapshots.create(spark, scratch(),
          orders.filter($"o_orderkey" % 7 === 0)).root)
      Engine.sql(spark, dir,
        "ALTER TABLE s19_t RENAME COLUMN o_totalprice TO price")
      // the renamed column must be addressable by statements AND stats
      Engine.sql(spark, dir,
        "UPDATE s19_t SET price = 0.5 WHERE o_orderstatus = 'O'")
      Engine.sql(spark, dir, "ALTER TABLE s19_t ADD COLUMNS (tag STRING)")
      Engine.sql(spark, dir,
        """INSERT INTO s19_t (o_orderkey, o_orderstatus, price, tag)
          |SELECT o_orderkey + 970000000, 'Z', 9.25, 'new'
          |FROM orders WHERE o_orderkey % 97 = 0""".stripMargin)
      Engine.sql(spark, dir, "ALTER TABLE s19_t DROP COLUMN o_orderkey")
      Engine.sql(spark, dir,
        """SELECT o_orderstatus, count(*) AS n, count(tag) AS n_tag,
          |  CAST(sum(CAST(price AS DECIMAL(25,2))) AS DOUBLE) AS price_sum
          |FROM s19_t GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    },

    // Multiple ordered WHEN NOT MATCHED arms: an unmatched source row takes
    // the FIRST arm whose condition holds ('O'-status rows with a large
    // price overlap both arms — arm order decides), and a row no arm
    // accepts is dropped. The oracle replays the arm selection as a CASE
    // with the same ordering.
    q("s21_sql_merge_multi_insert",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT o_orderstatus,
        |    CASE WHEN o_orderkey % 12 = 0 THEN 3.0 ELSE o_totalprice END
        |      AS o_totalprice
        |  FROM orders WHERE o_orderkey % 4 = 0
        |  UNION ALL
        |  SELECT o_orderstatus,
        |    CASE WHEN o_orderstatus = 'O' THEN 1.0 ELSE 2.0 END
        |  FROM orders WHERE o_orderkey % 6 = 0 AND o_orderkey % 12 <> 0
        |    AND (o_orderstatus = 'O' OR o_totalprice > 150000)
        |) GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val orders = Engine.table(spark, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      NamedTables.drop("s21_t")
      NamedTables.registerSnapshot("s21_t",
        Snapshots.create(spark, scratch(),
          orders.filter($"o_orderkey" % 4 === 0)).root)
      orders.filter($"o_orderkey" % 6 === 0)
        .select($"o_orderkey".as("k"), $"o_orderstatus".as("st"),
          $"o_totalprice".as("p"))
        .createOrReplaceTempView("s21_src")
      Engine.sql(spark, dir,
        """MERGE INTO s21_t t USING s21_src s ON t.o_orderkey = s.k
          |WHEN MATCHED THEN UPDATE SET o_totalprice = 3.0
          |WHEN NOT MATCHED AND s.st = 'O'
          |  THEN INSERT (o_orderkey, o_orderstatus, o_totalprice)
          |  VALUES (s.k, s.st, 1.0)
          |WHEN NOT MATCHED AND s.p > 150000
          |  THEN INSERT (o_orderkey, o_orderstatus, o_totalprice)
          |  VALUES (s.k, s.st, 2.0)""".stripMargin)
      Engine.sql(spark, dir,
        """SELECT o_orderstatus, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
          |FROM s21_t GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    },

    // Z-ordered, bloom-indexed layout under the gate: the snapshot is
    // rewritten on a two-column Morton curve with bloom filters on the
    // high-cardinality key, then point-filtered through the pruned read
    // path (plan-time stats + bloom skipping) — DuckDB replays the reads
    // as plain WHEREs over the original table, so the exotic layout must
    // change NOTHING about the answers.
    q("s20_sql_zorder_bloom",
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS qty,
        |  CAST(sum(CASE WHEN l_orderkey = 1 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
        |  CAST(sum(CASE WHEN l_partkey = 25 THEN 1 ELSE 0 END) AS BIGINT) AS p25
        |FROM lineitem WHERE l_orderkey % 5 = 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val li = Engine.table(spark, dir, "lineitem")
        .filter($"l_orderkey" % 5 === 1)
        .select($"l_orderkey", $"l_partkey", $"l_quantity")
      val root = scratch()
      val t = Snapshots.create(spark, root, li.repartition(8))
      t.setBloomColumns(Seq("l_orderkey"), numBits = 1 << 18)
      t.zOrderBy(Seq("l_orderkey", "l_partkey"), targetBytes = 64 * 1024)
      val all = t.read()
      val k1 = t.readWhere($"l_orderkey" === 1L).count()
      val p25 = t.readWhere($"l_partkey" === 25L).count()
      all.agg(count(lit(1)).as("n"),
        Exact.dsum($"l_quantity").as("qty"),
        lit(k1).as("k1"), lit(p25).as("p25"))
    },

    // Constraints under the gate: a table created with NOT NULL + CHECK +
    // DEFAULT, a bulk INSERT, a column-list INSERT exercising the DEFAULT
    // fill, and a violating INSERT that MUST be rejected atomically — if
    // enforcement broke, the bad row (or a missing default) would land in
    // the final state and hash-mismatch the oracle's plain-SQL replay
    // (ref ql/.../GenericUDFEnforceConstraint.java — Hive's enforced
    // NOT NULL/CHECK/DEFAULT surface).
    q("s22_sql_constraints",
      """SELECT id, name, CAST(amount AS DOUBLE) AS amount FROM (
        |  SELECT o_orderkey AS id, o_orderstatus AS name, o_totalprice AS amount
        |  FROM orders WHERE o_orderkey <= 200
        |  UNION ALL SELECT 900000001, 'D1', 7.5
        |  UNION ALL SELECT 900000002, 'D2', 7.5
        |) ORDER BY id""".stripMargin) { (spark, dir) =>
      if (NamedTables.get("s22_t").isDefined) NamedTables.drop("s22_t")
      val loc = scratch()
      Engine.sql(spark, dir,
        s"""CREATE TABLE s22_t (
           |  id BIGINT NOT NULL,
           |  name STRING,
           |  amount DOUBLE DEFAULT 7.5,
           |  CONSTRAINT amt_nonneg CHECK (amount >= 0))
           |USING snapshot LOCATION '$loc'""".stripMargin)
      Engine.sql(spark, dir,
        """INSERT INTO s22_t
          |SELECT o_orderkey, o_orderstatus, o_totalprice
          |FROM orders WHERE o_orderkey <= 200""".stripMargin)
      Engine.sql(spark, dir,
        "INSERT INTO s22_t (id, name) VALUES (900000001, 'D1'), (900000002, 'D2')")
      val rejected =
        try {
          Engine.sql(spark, dir,
            "INSERT INTO s22_t (id, name, amount) VALUES (900000003, 'BAD', -1.0)")
          false
        } catch { case _: Snapshots.ConstraintViolationException => true }
      require(rejected, "CHECK constraint did not reject the violating INSERT")
      Engine.sql(spark, dir,
        "SELECT id, name, CAST(amount AS DOUBLE) AS amount FROM s22_t ORDER BY id")
    },

    // HPL/SQL procedural script (graft.hplsql.Hplsql; ref hplsql/.../
    // Hplsql.g4): declares variables, iterates a cursor FOR loop over a
    // grouped query (variable substitution feeding the predicate), folds
    // per-segment counts into scalars, and materializes the final state via
    // a raw-SQL statement through the engine front door. The oracle replays
    // the whole script as one closed-form DuckDB query.
    q("s23_hplsql_script",
      """SELECT string_agg(seg, ';' ORDER BY seg) || ';' AS seg_list,
        |  CAST(sum(n) AS BIGINT) AS total_cnt,
        |  CAST(5000.0 AS DOUBLE) AS cutoff_used
        |FROM (SELECT c_mktsegment AS seg, count(*) AS n
        |      FROM customer WHERE c_acctbal > 5000.0
        |      GROUP BY c_mktsegment)""".stripMargin) { (spark, dir) =>
      graft.hplsql.Hplsql.run(spark,
        """DECLARE cutoff DOUBLE DEFAULT 5000.0;
          |DECLARE segs STRING DEFAULT '';
          |DECLARE total BIGINT DEFAULT 0;
          |FOR rec IN (SELECT c_mktsegment AS seg, count(*) AS n
          |            FROM customer
          |            WHERE c_acctbal > cutoff
          |            GROUP BY c_mktsegment
          |            ORDER BY c_mktsegment) LOOP
          |  SET segs = segs || rec.seg || ';';
          |  SET total = total + rec.n;
          |END LOOP;
          |CREATE OR REPLACE TEMP VIEW hpl_result AS
          |  SELECT segs AS seg_list, CAST(total AS BIGINT) AS total_cnt,
          |         CAST(cutoff AS DOUBLE) AS cutoff_used;
          |""".stripMargin)(q => Engine.sql(spark, dir, q))
      spark.sql("SELECT * FROM hpl_result")
    },

    // KV storage handler (sources.KvSource, the DSv2 HBase-handler-class
    // contract): a status dimension written through the handler (two
    // batches — the second upserts, exercising last-put-wins), read back
    // and joined to orders. The oracle replays the final KV state as a
    // VALUES dim, so the handler's put/merge/read path sits under the
    // cell-exact gate.
    q("s24_kv_storage_handler",
      """SELECT d.status_name, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM orders o
        |JOIN (VALUES ('O', 'open'), ('F', 'finalized'), ('P', 'pending'))
        |  AS d(status_key, status_name)
        |  ON o.o_orderstatus = d.status_key
        |GROUP BY d.status_name ORDER BY d.status_name""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Engine.register(spark, dir)
      val path = scratch()
      Seq(("O", "open"), ("F", "finished"), ("P", "pending"))
        .toDF("key", "value").write.format("graft-kv")
        .option("path", path).mode("append").save()
      // second batch upserts F — the read must see last-put-wins
      Seq(("F", "finalized")).toDF("key", "value").write.format("graft-kv")
        .option("path", path).mode("append").save()
      val dim = spark.read.format("graft-kv").option("path", path).load()
      Engine.table(spark, dir, "orders")
        .join(dim, col("o_orderstatus") === col("key"))
        .groupBy(col("value").as("status_name"))
        .agg(count(lit(1)).as("n"), Exact.dsum(col("o_totalprice")).as("total"))
        .orderBy("status_name")
    },

    // Authorization (plans.Authz; ref ql/.../sqlstd/
    // SQLStdHiveAuthorizationValidator.java + plugin/HiveAuthorizer.java's
    // row-filter/column-mask contract): deny-by-default is proven inside
    // the query (an ungranted read MUST throw), then a granted analyst
    // reads customer through a row filter + an md5 column mask. The oracle
    // replays the filtered, masked read as plain SQL — so the policy
    // rewrite itself sits under the cell-exact gate.
    q("s25_sql_authz",
      """SELECT c_custkey, md5(c_name) AS c_name,
        |  CAST(c_acctbal AS DOUBLE) AS c_acctbal
        |FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey <= 400
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      import graft.plans.Authz
      Authz.dropRowFilter("customer", Authz.Role("s25_analyst"))
      Authz.dropColumnMask("customer", "c_name", Authz.Role("s25_analyst"))
      try {
        spark.conf.set("spark.graft.authz.enabled", "true")
        spark.conf.set("spark.graft.user", "s25_nobody")
        val denied =
          try { Engine.sql(spark, dir, "SELECT count(*) FROM customer"); false }
          catch { case _: Authz.AccessDenied => true }
        require(denied, "authz did not deny the ungranted read")
        // a non-admin may not administer grants for themselves — the same
        // deny-by-default covers the admin verbs
        val grantDenied =
          try {
            Engine.sql(spark, dir,
              "GRANT SELECT ON TABLE customer TO USER s25_nobody"); false
          } catch { case _: Authz.AccessDenied => true }
        require(grantDenied, "authz let a non-admin GRANT to themselves")
        // administration happens as an admin
        spark.conf.set("spark.graft.authz.admins", "s25_admin")
        spark.conf.set("spark.graft.user", "s25_admin")
        Engine.sql(spark, dir, "CREATE ROLE s25_analyst")
        Engine.sql(spark, dir, "GRANT ROLE s25_analyst TO USER s25_reader")
        Engine.sql(spark, dir, "GRANT SELECT ON TABLE customer TO ROLE s25_analyst")
        Engine.sql(spark, dir,
          "ALTER TABLE customer SET ROW FILTER 'c_mktsegment = ''BUILDING''' " +
            "FOR ROLE s25_analyst")
        Engine.sql(spark, dir,
          "ALTER TABLE customer SET COLUMN MASK c_name AS 'md5(c_name)' " +
            "FOR ROLE s25_analyst")
        spark.conf.set("spark.graft.user", "s25_reader")
        Engine.sql(spark, dir,
          """SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
            |FROM customer WHERE c_custkey <= 400
            |ORDER BY c_custkey""".stripMargin)
      } finally {
        // policies bake into the returned plan at build time, so resetting
        // session/auth state here cannot un-filter the lazy evaluation
        spark.conf.unset("spark.graft.authz.enabled")
        spark.conf.unset("spark.graft.user")
        spark.conf.unset("spark.graft.authz.admins")
        Authz.dropRowFilter("customer", Authz.Role("s25_analyst"))
        Authz.dropColumnMask("customer", "c_name", Authz.Role("s25_analyst"))
      }
    },

    // Workload management (plans.Workload; ref ql/ddl/workloadmanagement/
    // + exec/tez/WorkloadManager.java): the resource plan is built and
    // activated through SQL verbs, a KILL trigger is proven to cancel an
    // over-limit query mid-flight (required inside the query, like s25's
    // deny proof), and the returned result is computed UNDER management —
    // admitted through the mapped pool's semaphore with the trigger
    // armed. The oracle replays the data query as plain SQL.
    q("s26_wlm_managed_query",
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderkey <= 5000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      import graft.plans.Workload
      import org.apache.spark.sql.functions.udf
      Engine.register(spark, dir)
      Workload.clearAll()
      try {
        Engine.sql(spark, dir, "CREATE RESOURCE PLAN s26_plan")
        Engine.sql(spark, dir,
          "CREATE POOL s26_plan.etl WITH ALLOC_FRACTION=0.8, QUERY_PARALLELISM=2")
        Engine.sql(spark, dir,
          "CREATE TRIGGER s26_plan.slow_kill WHEN ELAPSED_TIME > 500 DO KILL")
        Engine.sql(spark, dir, "ALTER POOL s26_plan.etl ADD TRIGGER slow_kill")
        Engine.sql(spark, dir, "CREATE USER MAPPING 's26_etl' IN s26_plan TO etl")
        Engine.sql(spark, dir, "ALTER RESOURCE PLAN s26_plan ACTIVATE")
        val killed =
          try {
            Workload.run(spark, "s26_etl") { _ =>
              val slow = udf((x: Long) => { Thread.sleep(8); x })
                .asNondeterministic()
              spark.range(0, 4000, 1, 8).select(slow(col("id")).as("v"))
                .agg(sum("v")).head.getLong(0)
            }
            false
          } catch { case _: Workload.QueryKilledException => true }
        require(killed, "WLM kill trigger did not cancel the over-limit query")
        Workload.run(spark, "s26_etl") { pool =>
          require(pool == "etl", s"mapping routed to $pool, expected etl")
          Engine.sql(spark, dir,
            """SELECT o_orderpriority, count(*) AS n,
              |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
              |FROM orders WHERE o_orderkey <= 5000
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
        }
      } finally Workload.clearAll()
    },

    // SerDe-class text readers (sources.TextFormats; ref serde2/
    // RegexSerDe.java + MultiDelimitSerDe.java): orders rows round-trip
    // through a `||`-delimited text file, read back by BOTH the regex
    // reader (capture groups -> columns) and the multi-delimiter reader,
    // inner-joined so a single mis-parsed row would break the counts.
    // The oracle replays the aggregate straight from the parquet table —
    // if either reader dropped, duplicated, or corrupted a row, the
    // hash mismatches.
    q("s27_text_serde",
      """SELECT o_orderstatus, count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sk
        |FROM orders WHERE o_orderkey <= 3000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      val path = scratch()
      Engine.table(spark, dir, "orders")
        .filter(col("o_orderkey") <= 3000)
        .select(concat_ws("||",
          col("o_orderkey"), col("o_orderstatus")).as("value"))
        .write.text(path)
      val viaRegex = graft.sources.TextFormats.readRegex(spark, path,
        "^(\\d+)\\|\\|(\\w)$", Seq("k", "status"))
      val viaDelim = graft.sources.TextFormats.readMultiDelim(spark, path,
        "||", Seq("k2", "status2"))
      viaRegex.join(viaDelim,
          viaRegex("k") === viaDelim("k2") &&
            viaRegex("status") === viaDelim("status2"))
        .groupBy(col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("k").cast("long")).as("sk"))
        .orderBy("o_orderstatus")
    },

    // Teradata-binary SerDe (sources.BinaryFormats; ref serde2/teradata/
    // TeradataBinarySerde.java + io/TeradataBinaryRecordReader.java):
    // orders rows round-trip through the FastExport "binary indicators"
    // layout — 2-byte LE record length, null bitmap, typed fields
    // (bigint/varchar/date/decimal on this path), 0x0A terminator —
    // written and decoded by the from-scratch wire codec. The oracle
    // replays the aggregate from parquet: one mis-framed record, flipped
    // byte order, or broken decimal scaling breaks the hash.
    q("s28_teradata_binary",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sk,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total,
        |  CAST(min(o_orderdate) AS DATE) AS first_day
        |FROM orders WHERE o_orderkey <= 4000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      val path = scratch()
      val fields = Seq("o_orderkey" -> "bigint", "o_orderstatus" -> "varchar",
        "o_totalprice" -> "decimal(15,2)", "o_orderdate" -> "date")
      val src = Engine.table(spark, dir, "orders")
        .filter(col("o_orderkey") <= 4000)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(15,2)"),
          col("o_orderdate").cast("date"))
      graft.sources.BinaryFormats.writeTeradataBinary(src, fields, path)
      graft.sources.BinaryFormats.readTeradataBinary(spark, path, fields)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").as("sk"),
          Exact.dsum(col("o_totalprice").cast("double")).as("total"),
          min("o_orderdate").as("first_day"))
        .orderBy("o_orderstatus")
    },

    // Protobuf SerDe (sources.BinaryFormats; ref ql/io/protobuf/
    // ProtobufSerDe.java + the public protobuf wire spec): orders rows
    // round-trip as size-delimited wire messages (varint tags, zigzag,
    // length-delimited strings) through the from-scratch codec, with an
    // EXTRA field written that the read spec does not declare — the
    // decode must skip it by wire type (forward compatibility) and still
    // produce cell-exact aggregates vs the parquet replay.
    q("s29_protobuf_serde",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sk,
        |  CAST(sum(CAST(-o_custkey AS BIGINT)) AS BIGINT) AS neg_cust
        |FROM orders WHERE o_orderkey <= 4000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      import graft.sources.BinaryFormats.ProtoField
      val path = scratch()
      val writeSpec = Seq(
        ProtoField(1, "o_orderkey", "int64"),
        ProtoField(2, "o_orderstatus", "string"),
        ProtoField(3, "neg_cust", "sint64"), // negative: exercises zigzag
        ProtoField(4, "o_orderpriority", "string")) // extra: reader skips it
      val readSpec = writeSpec.filterNot(_.number == 4)
      val src = Engine.table(spark, dir, "orders")
        .filter(col("o_orderkey") <= 4000)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (-col("o_custkey")).cast("long").as("neg_cust"),
          col("o_orderpriority"))
      graft.sources.BinaryFormats.writeProtobuf(src, writeSpec, path)
      graft.sources.BinaryFormats.readProtobuf(spark, path, readSpec)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").as("sk"),
          sum("neg_cust").as("neg_cust"))
        .orderBy("o_orderstatus")
    },

    // Enclosed Esri-JSON features (sources.EnclosedJson; ref ql/io/esriJson/
    // EnclosedEsriJsonInputFormat.java + udf/esri/serde/EsriJsonSerDe.java):
    // nation rows become feature-per-line Esri JSON (typed attributes +
    // point geometry), read back through the enclosed reader, with the
    // geometry consumed via st_x — so the attribute extraction, the Esri
    // geometry dialect parse, AND the ST accessor all sit under the
    // cell-exact gate; the oracle replays the arithmetic from parquet.
    q("s30_enclosed_esri_json",
      """SELECT n_regionkey, count(*) AS n,
        |  CAST(sum(n_nationkey) AS BIGINT) AS sk,
        |  CAST(sum(CAST((n_nationkey % 5) * 10 AS BIGINT)) AS DOUBLE) AS sx
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) {
      (spark, dir) =>
      val path = scratch()
      Engine.table(spark, dir, "nation")
        .select(concat(
          lit("""{"attributes":{"nkey":"""), col("n_nationkey"),
          lit(""","name":""""), col("n_name"),
          lit("""","rkey":"""), col("n_regionkey"),
          lit("""},"geometry":{"x":"""), (col("n_nationkey") % 5) * 10,
          lit(""","y":"""), floor(col("n_nationkey") / 5),
          lit("}}")).as("value"))
        .write.text(path)
      val feats = graft.sources.EnclosedJson.readEsriJson(spark, path,
        Seq("nkey" -> "bigint", "name" -> "string", "rkey" -> "bigint"))
      feats.select(col("rkey").as("n_regionkey"), col("nkey"),
          expr("st_x(shape)").as("x"))
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), sum("nkey").as("sk"), sum("x").as("sx"))
        .orderBy("n_regionkey")
    },

    // Snapshot refs: the WAP (write-audit-publish) lifecycle through the
    // SQL verbs (ref ql/ddl/table/snapshotref/ + iceberg-handler
    // IcebergSnapshotRefExec.java — Hive 4's ALTER TABLE CREATE BRANCH /
    // EXECUTE FAST-FORWARD): stage rows on a branch via the
    // `t.branch_<name>` insert spelling, PROVE in-query that the mainline
    // stayed at its pre-publish count while the branch carried the staged
    // rows, then fast-forward and emit the published state. The oracle
    // replays the end state; the intermediate invariants are require()d.
    // Bucketed snapshot tables + storage-partitioned join: two CTAS with
    // CLUSTERED BY (custkey) INTO 8 BUCKETS, joined on the bucket key.
    // The in-query invariant proves the join planned with ZERO shuffle
    // exchanges (the reference's sort-merge-bucket map join, ref
    // ql/.../optimizer/AbstractSMBJoinProc.java); the oracle replays the
    // same join-aggregate over the raw tables.
    q("s32_bucketed_spj",
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
      Seq("s32_o", "s32_c").foreach(n =>
        if (NamedTables.get(n).isDefined) NamedTables.drop(n))
      def sql(q: String) = Engine.sql(spark, dir, q)
      sql(s"""CREATE TABLE s32_o USING snapshot
             |CLUSTERED BY (o_custkey) INTO 8 BUCKETS LOCATION '${scratch()}'
             |AS SELECT o_orderkey, o_custkey FROM orders""".stripMargin)
      sql(s"""CREATE TABLE s32_c USING snapshot
             |CLUSTERED BY (c_custkey) INTO 8 BUCKETS LOCATION '${scratch()}'
             |AS SELECT c_custkey, c_mktsegment FROM customer""".stripMargin)
      // the invariant join runs with auto-broadcast OFF: at oracle scale
      // customer would broadcast and zero-shuffle would be vacuously true
      // of any layout — forcing the sort-merge path proves the BUCKETS
      // carried the co-partitioning (the two-fact-tables shape at 100 TB)
      val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = sql(
          "SELECT c_mktsegment, o_orderkey FROM s32_c JOIN s32_o " +
            "ON c_custkey = o_custkey")
        joined.write.format("noop").mode("overwrite").save()
        // recursive traversal: AQE wrappers (AdaptiveSparkPlanExec /
        // QueryStageExec) hide realized subtrees from plain collect, which
        // would make this invariant vacuously true on a shuffling plan
        def nodes(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            p +: nodes(a.executedPlan)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            p +: nodes(qs.plan)
          case other => other +: other.children.flatMap(nodes)
        }
        val all = nodes(joined.queryExecution.executedPlan)
        val nShuffles = all.count(_.isInstanceOf[
          org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
        require(nShuffles == 0,
          s"co-bucketed join must plan without exchanges, got $nShuffles")
        require(all.exists(_.isInstanceOf[
            org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
          "expected a sort-merge join with broadcast disabled")
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      sql("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
            |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
            |FROM s32_c JOIN s32_o ON c_custkey = o_custkey
            |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    },

    // Partition-spec evolution (ref ql/ddl/table/partition/set/
    // AlterTableSetPartitionSpecAnalyzer.java + iceberg-handler
    // HiveIcebergMetaHook.java:519 + PartitionTransform.java:33-38):
    // CREATE partitioned by o_orderstatus, evolve to o_orderpriority,
    // then evolve again to a TRANSFORM spec — month(o_orderdate) — each a
    // metadata-only commit, one third of orders inserted under each
    // generation. (month, not day: the fixture spans ~84 months, so
    // month-grain dirs match the data density where day-grain would be
    // the classic over-partitioning anti-pattern — thousands of
    // handful-of-row files.) In-query invariants prove the table holds
    // files of all THREE generations, that a predicate on each
    // generation's partition source prunes that generation by path —
    // including a date RANGE predicate pruning month(o_orderdate) dirs
    // with stats stripped, so only the transform mapping can be doing the
    // work — and that time travel keeps the birth spec. The final
    // aggregate groups over everything; the oracle replays it over raw
    // orders.
    q("s34_partition_spec_evolution",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders
        |GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin) { (spark, dir) =>
      if (NamedTables.get("s34_t").isDefined) NamedTables.drop("s34_t")
      def sql(q: String) = Engine.sql(spark, dir, q)
      val loc = scratch()
      sql(s"""CREATE TABLE s34_t USING snapshot
             |PARTITIONED BY (o_orderstatus) LOCATION '$loc'
             |AS SELECT o_orderkey, o_orderstatus, o_orderpriority, o_orderdate
             |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin)
      sql("ALTER TABLE s34_t SET PARTITION SPEC (o_orderpriority)")
      sql("""INSERT INTO s34_t
            |SELECT o_orderkey, o_orderstatus, o_orderpriority, o_orderdate
            |FROM orders WHERE o_orderkey % 3 = 1""".stripMargin)
      sql("ALTER TABLE s34_t SET PARTITION SPEC (month(o_orderdate))")
      sql("""INSERT INTO s34_t
            |SELECT o_orderkey, o_orderstatus, o_orderpriority, o_orderdate
            |FROM orders WHERE o_orderkey % 3 = 2""".stripMargin)
      val t = Snapshots.table(spark, loc)
      val head = t.latest()
      val gen1 = head.files.filter(_.contains("o_orderstatus="))
      val gen2 = head.files.filter(_.contains("o_orderpriority="))
      val gen3 = head.files.filter(_.contains("o_orderdate_month="))
      require(gen1.nonEmpty && gen2.nonEmpty && gen3.nonEmpty &&
          (gen1 ++ gen2 ++ gen3).toSet == head.files.toSet,
        s"expected files under all three specs, got ${head.files}")
      // the evolution commits moved no data; time travel keeps each spec
      require(t.history().head.partitionCols == Seq("o_orderstatus"),
        "time travel must preserve the birth spec")
      require(t.latest().partitionCols == Seq("o_orderdate_month"),
        "head must carry the transform spec")
      // each generation prunes under its OWN spec (path-exact); the other
      // generations fall back to stats
      val onStatus = t.planFiles(head, col("o_orderstatus") === "F")
      require(onStatus.filter(_.contains("o_orderstatus="))
          .forall(_.contains("o_orderstatus=F")),
        "gen-1 files must prune by their path value")
      require(onStatus.nonEmpty && onStatus.size < head.files.size,
        "the o_orderstatus predicate must prune some files")
      val onPrio = t.planFiles(head, col("o_orderpriority") === "1-URGENT")
      require(onPrio.filter(_.contains("o_orderpriority="))
          .forall(_.contains("o_orderpriority=1-URGENT")),
        "gen-2 files must prune by their path value")
      // the transform generation: a RANGE predicate on the SOURCE column
      // prunes month dirs with stats stripped — only the transform's
      // dir-value→source-range mapping can be responsible
      val lo = java.sql.Timestamp.valueOf("1995-06-10 00:00:00")
      val hi = java.sql.Timestamp.valueOf("1995-08-20 00:00:00")
      val onDate = t.planFiles(head.copy(stats = Map.empty),
        col("o_orderdate") >= lo && col("o_orderdate") < hi)
      val keptMonths = onDate.filter(_.contains("o_orderdate_month="))
        .flatMap(_.split('/').find(_.startsWith("o_orderdate_month=")))
        .distinct.sorted
      require(keptMonths.nonEmpty && keptMonths.forall(
          Set("o_orderdate_month=1995-06", "o_orderdate_month=1995-07",
            "o_orderdate_month=1995-08")),
        s"month dirs must prune to the predicate's range, got $keptMonths")
      require(onDate.size < head.files.size,
        "the date range must prune the transform generation")
      sql("""SELECT o_orderstatus, o_orderpriority,
            |  CAST(count(*) AS BIGINT) AS n,
            |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
            |FROM s34_t GROUP BY o_orderstatus, o_orderpriority
            |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
    },

    q("s31_branch_wap",
      """SELECT CAST(id AS BIGINT) AS id, name,
        |  CAST(5 AS BIGINT) AS n_before_publish,
        |  CAST(7 AS BIGINT) AS n_branch_staged
        |FROM (
        |  SELECT r_regionkey AS id, r_name AS name FROM region
        |  UNION ALL SELECT 900000001, 'W1'
        |  UNION ALL SELECT 900000002, 'W2'
        |) ORDER BY id""".stripMargin) { (spark, dir) =>
      if (NamedTables.get("s31_t").isDefined) NamedTables.drop("s31_t")
      val loc = scratch()
      def sql(q: String) = Engine.sql(spark, dir, q)
      sql(s"CREATE TABLE s31_t (id BIGINT, name STRING) " +
        s"USING snapshot LOCATION '$loc'")
      sql("INSERT INTO s31_t SELECT r_regionkey, r_name FROM region")
      sql("ALTER TABLE s31_t CREATE TAG ingested")
      sql("ALTER TABLE s31_t CREATE BRANCH wap")
      sql("INSERT INTO s31_t.branch_wap VALUES (900000001, 'W1'), (900000002, 'W2')")
      // audit phase: mainline untouched, branch carries the staged rows
      val mainN = sql("SELECT count(*) AS n FROM s31_t").head.getLong(0)
      val branchN = sql("SELECT count(*) AS n FROM s31_t.branch_wap").head.getLong(0)
      require(mainN == 5, s"branch insert leaked into the mainline: $mainN")
      require(branchN == 7, s"branch head lost staged rows: $branchN")
      // publish
      sql("ALTER TABLE s31_t EXECUTE FAST-FORWARD 'wap'")
      val tagN = sql("SELECT count(*) AS n FROM s31_t.tag_ingested").head.getLong(0)
      require(tagN == 5, s"tag must still pin the pre-publish state: $tagN")
      sql("ALTER TABLE s31_t DROP BRANCH wap")
      sql(s"""SELECT id, name, CAST($mainN AS BIGINT) AS n_before_publish,
             |  CAST($branchN AS BIGINT) AS n_branch_staged
             |FROM s31_t ORDER BY id""".stripMargin)
    },

    // branch-addressed DML: a WAP branch stages CORRECTIONS — UPDATE,
    // DELETE, and MERGE commit onto the branch head (ref the Hive-Iceberg
    // t.branch_x write spelling) while the mainline and tags stay pinned;
    // FAST-FORWARD publishes. The oracle replays the post-publish state
    // algebraically: +100 on BUILDING balances, drop post-update
    // negatives, re-segment every 100th customer, one inserted row.
    q("s36_branch_dml",
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  CASE WHEN c_custkey % 100 = 0 THEN 'MERGED'
        |       ELSE c_mktsegment END AS seg,
        |  c_acctbal + (CASE WHEN c_mktsegment = 'BUILDING'
        |               THEN 100.0 ELSE 0.0 END) AS bal
        |FROM customer
        |WHERE c_acctbal + (CASE WHEN c_mktsegment = 'BUILDING'
        |      THEN 100.0 ELSE 0.0 END) >= 0
        |UNION ALL SELECT 900000001, 'NEW', 1.5
        |ORDER BY id""".stripMargin) { (spark, dir) =>
      if (NamedTables.get("s36_t").isDefined) NamedTables.drop("s36_t")
      val loc = scratch()
      def sql(q: String) = Engine.sql(spark, dir, q)
      sql(s"""CREATE TABLE s36_t USING snapshot LOCATION '$loc'
             |AS SELECT c_custkey, c_mktsegment, c_acctbal
             |FROM customer""".stripMargin)
      val n0 = sql("SELECT count(*) AS n FROM s36_t").head.getLong(0)
      sql("ALTER TABLE s36_t CREATE TAG pre")
      sql("ALTER TABLE s36_t CREATE BRANCH fix")
      // corrections staged ON THE BRANCH, in sequence: each verb reads the
      // branch head the previous one produced
      sql("""UPDATE s36_t.branch_fix SET c_acctbal = c_acctbal + 100.0
            |WHERE c_mktsegment = 'BUILDING'""".stripMargin)
      sql("DELETE FROM s36_t.branch_fix WHERE c_acctbal < 0")
      sql("""MERGE INTO s36_t.branch_fix AS t USING (
            |  SELECT c_custkey AS id, 'MERGED' AS seg FROM s36_t
            |  WHERE c_custkey % 100 = 0
            |  UNION ALL SELECT 900000001, 'NEW'
            |) AS s ON t.c_custkey = s.id
            |WHEN MATCHED THEN UPDATE SET c_mktsegment = s.seg
            |WHEN NOT MATCHED AND s.id = 900000001 THEN
            |  INSERT (c_custkey, c_mktsegment, c_acctbal)
            |  VALUES (s.id, s.seg, 1.5)""".stripMargin)
      // audit: mainline and tag still read the UNCORRECTED state
      val mainN = sql("SELECT count(*) AS n FROM s36_t").head.getLong(0)
      require(mainN == n0, s"branch DML leaked into the mainline: $mainN != $n0")
      val tagN = sql("SELECT count(*) AS n FROM s36_t.tag_pre").head.getLong(0)
      require(tagN == n0, s"tag must pin the pre-correction state: $tagN")
      // publish the corrected state
      sql("ALTER TABLE s36_t EXECUTE FAST-FORWARD 'fix'")
      val tagAfter = sql("SELECT count(*) AS n FROM s36_t.tag_pre").head.getLong(0)
      require(tagAfter == n0, "the tag must survive the publish unchanged")
      sql("""SELECT CAST(c_custkey AS BIGINT) AS id, c_mktsegment AS seg,
            |  c_acctbal AS bal
            |FROM s36_t ORDER BY id""".stripMargin)
    })
}
