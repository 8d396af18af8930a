package graft

/** Hive qtest-style golden scripts (SURVEY §5: the .q scripts under
  * ql/src/test/queries/clientpositive plus golden .q.out diffs, driver
  * QTestUtil.java:110).
  * A script is a ';'-separated mix of DDL/DML/SELECT; the harness executes
  * each statement against the engine and renders results deterministically
  * (TAB-separated cells, NULL for nulls, non-query statements echo a marker).
  * The rendered transcript is diffed against the inline golden — the same
  * masking discipline as Hive's harness, with unstable output (paths, plans,
  * timings) never rendered.
  */
class GoldenScriptSpec extends SparkSpec {

  private def runScript(script: String): String = {
    Engine.register(spark, sfDir)
    script.split(";").map(_.trim).filter(_.nonEmpty).map { stmt =>
      val body =
        try {
          // the engine's SQL front door: DML statements and named snapshot
          // tables work in scripts exactly as interactively
          val df = Engine.sql(spark, sfDir, stmt)
          val isQuery = df.schema.nonEmpty
          if (stmt.toUpperCase.startsWith("EXPLAIN"))
            // plans are version/stats-dependent — masked, like the reference's
            // QTestUtil output masking; only plan presence is golden
            if (df.collect().exists(_.getString(0).nonEmpty)) "PLAN(masked)" else "PLAN(empty)"
          else if (isQuery)
            df.collect().map(_.toSeq.map {
              case null => "NULL"
              case d: Double => if (d == d.floor && !d.isInfinite) f"$d%.1f" else d.toString
              case v => v.toString
            }.mkString("\t")).mkString("\n")
          else "OK"
        } catch {
          // clientnegative analog: expected failures render as the error class
          case e: Exception => s"ERROR(${e.getClass.getSimpleName})"
        }
      s"> ${stmt.linesIterator.mkString(" ").replaceAll("\\s+", " ")}\n$body"
    }.mkString("\n")
  }

  test("golden: ddl + insert + select transcript") {
    val got = runScript(
      """CREATE OR REPLACE TEMP VIEW g_src AS
        |  SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, 'a') AS t(id, tag);
        |SELECT tag, count(*) AS n, sum(id) AS s FROM g_src GROUP BY tag ORDER BY tag;
        |SELECT id, tag FROM g_src WHERE id > 1 ORDER BY id DESC;
        |SELECT upper(tag) AS u, id * 10 AS x FROM g_src WHERE tag = 'a' ORDER BY id""".stripMargin)
    val golden =
      """> CREATE OR REPLACE TEMP VIEW g_src AS SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, 'a') AS t(id, tag)
        |OK
        |> SELECT tag, count(*) AS n, sum(id) AS s FROM g_src GROUP BY tag ORDER BY tag
        |a	2	4
        |b	1	2
        |> SELECT id, tag FROM g_src WHERE id > 1 ORDER BY id DESC
        |3	a
        |2	b
        |> SELECT upper(tag) AS u, id * 10 AS x FROM g_src WHERE tag = 'a' ORDER BY id
        |A	10
        |A	30""".stripMargin
    assert(got === golden)
  }

  test("golden: SQL DML lifecycle transcript (CTAS, UPDATE, MERGE, time travel)") {
    val root = java.nio.file.Files.createTempDirectory("graft_gscript_")
      .toString + "/t"
    // the root path is unstable output — masked in both directions, like
    // the reference harness masks file paths in .q.out
    val got = runScript(
      s"""CREATE TABLE g_dml USING snapshot LOCATION '$root'
         |  AS SELECT * FROM VALUES (1,'a',10.0),(2,'b',20.0),(3,'a',30.0) AS t(id, tag, price);
         |UPDATE g_dml SET price = 0.0 WHERE tag = 'b';
         |MERGE INTO g_dml t
         |  USING (SELECT * FROM VALUES (3, 99.0), (4, 44.0) AS v(id, p)) s
         |  ON t.id = s.id
         |  WHEN MATCHED THEN UPDATE SET price = s.p
         |  WHEN NOT MATCHED THEN INSERT (id, tag, price) VALUES (s.id, 'new', s.p);
         |SELECT id, tag, price FROM g_dml ORDER BY id;
         |SELECT count(*) AS n FROM g_dml VERSION AS OF 0;
         |DELETE FROM g_dml WHERE id = 1;
         |SELECT id FROM g_dml ORDER BY id;
         |DROP TABLE g_dml""".stripMargin).replace(root, "MASKED_ROOT")
    val golden =
      """> CREATE TABLE g_dml USING snapshot LOCATION 'MASKED_ROOT' AS SELECT * FROM VALUES (1,'a',10.0),(2,'b',20.0),(3,'a',30.0) AS t(id, tag, price)
        |OK
        |> UPDATE g_dml SET price = 0.0 WHERE tag = 'b'
        |OK
        |> MERGE INTO g_dml t USING (SELECT * FROM VALUES (3, 99.0), (4, 44.0) AS v(id, p)) s ON t.id = s.id WHEN MATCHED THEN UPDATE SET price = s.p WHEN NOT MATCHED THEN INSERT (id, tag, price) VALUES (s.id, 'new', s.p)
        |OK
        |> SELECT id, tag, price FROM g_dml ORDER BY id
        |1	a	10.0
        |2	b	0.0
        |3	a	99.0
        |4	new	44.0
        |> SELECT count(*) AS n FROM g_dml VERSION AS OF 0
        |3
        |> DELETE FROM g_dml WHERE id = 1
        |OK
        |> SELECT id FROM g_dml ORDER BY id
        |2
        |3
        |4
        |> DROP TABLE g_dml
        |OK""".stripMargin
    assert(got === golden)
  }

  test("golden: EXPLAIN output is masked, results are not") {
    val got = runScript(
      """EXPLAIN SELECT r_name FROM region WHERE r_regionkey = 1;
        |SELECT r_name FROM region WHERE r_regionkey = 1""".stripMargin)
    val golden =
      """> EXPLAIN SELECT r_name FROM region WHERE r_regionkey = 1
        |PLAN(masked)
        |> SELECT r_name FROM region WHERE r_regionkey = 1
        |AMERICA""".stripMargin
    assert(got === golden)
  }

  test("golden: negative script records the error class (clientnegative analog)") {
    // Hive's clientnegative suite asserts expected failures; a failing
    // statement renders as ERROR(<exception class>) and the script continues.
    val got = runScript(
      """SELECT no_such_column FROM region;
        |SELECT r_name FROM no_such_table;
        |SELECT count(*) FROM region""".stripMargin)
    val golden =
      """> SELECT no_such_column FROM region
        |ERROR(ExtendedAnalysisException)
        |> SELECT r_name FROM no_such_table
        |ERROR(ExtendedAnalysisException)
        |> SELECT count(*) FROM region
        |5""".stripMargin
    assert(got === golden)
  }

  test("golden: testdata aggregate over the TPC-H fixture") {
    val got = runScript(
      """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey;
        |SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    val golden =
      """> SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey
        |0	AFRICA
        |1	AMERICA
        |2	ASIA
        |3	EUROPE
        |4	MIDDLE EAST
        |> SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
        |F	493
        |O	514
        |P	493""".stripMargin
    assert(got === golden)
  }
}
