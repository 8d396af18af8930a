package graft.plans

import org.scalatest.matchers.should.Matchers
import graft.SparkSpec
import graft.hplsql.Hplsql

/** HPL/SQL procedural interpreter (ref hplsql/.../Hplsql.g4). */
class HplsqlSpec extends SparkSpec with Matchers {

  def run(script: String): Hplsql.Result = Hplsql.run(spark, script)

  test("declare, assign, arithmetic, print") {
    val r = run("""
      DECLARE x INT DEFAULT 3;
      DECLARE y INT;
      SET y = x * 4;
      x := x + 1;
      PRINT 'x=' || x || ' y=' || y;
    """)
    r.printed shouldBe Seq("x=4 y=12")
    r.variables("x") shouldBe 4
    r.variables("y") shouldBe 12
  }

  test("if / elsif / else") {
    val r = run("""
      DECLARE v INT DEFAULT 7;
      IF v > 10 THEN PRINT 'big';
      ELSIF v > 5 THEN PRINT 'mid';
      ELSE PRINT 'small';
      END IF;
    """)
    r.printed shouldBe Seq("mid")
  }

  test("while loop with exit when") {
    val r = run("""
      DECLARE i INT DEFAULT 0;
      DECLARE acc INT DEFAULT 0;
      WHILE true LOOP
        SET i = i + 1;
        SET acc = acc + i;
        EXIT WHEN i >= 5;
      END LOOP;
      PRINT acc;
    """)
    r.printed shouldBe Seq("15")
  }

  test("for range loop, reverse, by step") {
    val r = run("""
      DECLARE s STRING DEFAULT '';
      FOR i IN 1..5 LOOP SET s = s || i; END LOOP;
      PRINT s;
      SET s = '';
      FOR i IN REVERSE 1..5 LOOP SET s = s || i; END LOOP;
      PRINT s;
      SET s = '';
      FOR i IN 0..10 BY 5 LOOP SET s = s || i || ','; END LOOP;
      PRINT s;
    """)
    r.printed shouldBe Seq("12345", "54321", "0,5,10,")
  }

  test("cursor for loop binds rec.col fields") {
    val r = run("""
      DECLARE total DOUBLE DEFAULT 0;
      DECLARE names STRING DEFAULT '';
      FOR rec IN (SELECT 'a' AS nm, 1.5 AS v UNION ALL SELECT 'b', 2.5 ORDER BY nm) LOOP
        SET total = total + rec.v;
        SET names = names || rec.nm;
      END LOOP;
      PRINT names || ':' || total;
    """)
    r.printed shouldBe Seq("ab:4.0")
  }

  test("select into and execute immediate into") {
    val r = run("""
      DECLARE c BIGINT;
      DECLARE m STRING;
      SELECT count(*), max(x) INTO c, m FROM (SELECT 'q' AS x UNION ALL SELECT 'z');
      EXECUTE IMMEDIATE 'SELECT ' || c * 10 INTO c;
      PRINT c || '/' || m;
    """)
    r.printed shouldBe Seq("20/z")
  }

  test("procedures with parameters and call") {
    val r = run("""
      CREATE PROCEDURE greet(who STRING, n INT)
      BEGIN
        FOR i IN 1..n LOOP PRINT 'hello ' || who; END LOOP;
      END;
      CALL greet('world', 2);
    """)
    r.printed shouldBe Seq("hello world", "hello world")
  }

  test("functions are callable inside expressions") {
    val r = run("""
      CREATE FUNCTION double_it(v INT) RETURNS INT
      BEGIN
        RETURN v * 2;
      END;
      DECLARE z INT;
      SET z = double_it(21);
      PRINT z;
    """)
    r.printed shouldBe Seq("42")
  }

  test("begin/exception block catches SQL errors; sqlerrm is bound") {
    val r = run("""
      DECLARE msg STRING DEFAULT 'none';
      BEGIN
        SELECT 1 INTO msg FROM table_that_does_not_exist_xyz;
      EXCEPTION WHEN OTHERS THEN
        PRINT 'caught';
      END;
      PRINT msg;
    """)
    r.printed shouldBe Seq("caught", "none")
  }

  test("return ends the script with a value") {
    val r = run("""
      DECLARE x INT DEFAULT 1;
      IF x = 1 THEN RETURN 'early'; END IF;
      PRINT 'unreachable';
    """)
    r.printed shouldBe empty
    r.returned shouldBe Some("early")
  }

  test("raw SQL passes through with variable substitution") {
    val tmp = java.nio.file.Files.createTempDirectory("hpl_").toString
    val r = run(s"""
      DECLARE lim INT DEFAULT 2;
      DECLARE marker STRING DEFAULT 'tagged';
      CREATE OR REPLACE TEMP VIEW hpl_v AS
        SELECT id, marker AS tag FROM range(10) WHERE id < lim;
      SELECT count(*) INTO lim FROM hpl_v;
      PRINT lim;
      FOR rec IN (SELECT tag FROM hpl_v LIMIT 1) LOOP PRINT rec.tag; END LOOP;
    """)
    r.printed shouldBe Seq("2", "tagged")
  }

  test("variable names inside string literals are NOT substituted") {
    val r = run("""
      DECLARE x INT DEFAULT 5;
      PRINT 'x is untouched: x';
      PRINT x;
    """)
    r.printed shouldBe Seq("x is untouched: x", "5")
  }

  test("nested blocks scope their declarations") {
    val r = run("""
      DECLARE x INT DEFAULT 1;
      BEGIN
        DECLARE x INT DEFAULT 99;
        PRINT x;
      END;
      PRINT x;
    """)
    r.printed shouldBe Seq("99", "1")
  }

  test("loop-control expressions run on the local fast path (10k iterations)") {
    val t0 = System.nanoTime()
    val r = run("""
      DECLARE acc BIGINT DEFAULT 0;
      DECLARE i INT DEFAULT 0;
      WHILE i < 10000 LOOP
        SET i = i + 1;
        IF i % 2 = 0 THEN SET acc = acc + i; END IF;
      END LOOP;
      PRINT acc;
    """)
    val sec = (System.nanoTime() - t0) / 1e9
    r.printed shouldBe Seq("25005000")
    // 30k+ expression evaluations: a Spark round-trip per eval would take
    // minutes; the local fast path finishes in well under 10s
    sec should be < 10.0
  }

  test("fast path falls back to Spark for SQL functions and agrees with it") {
    val r = run("""
      DECLARE a DOUBLE DEFAULT 10 / 4;        -- fast path: non-ANSI int/int -> double
      DECLARE b STRING DEFAULT upper('ok');   -- SQL function -> Spark fallback
      DECLARE c BIGINT DEFAULT 7 % 0;         -- division by zero -> NULL, both paths
      DECLARE d STRING DEFAULT 1.5 || '|' || (2 = 2) || '|' || (NULL IS NULL);
      PRINT a || '/' || b || '/' || coalesce(c, -1) || '/' || d;
    """)
    r.printed shouldBe Seq("2.5/OK/-1/1.5|true|true")
  }

  test("procedural MERGE loop against a named snapshot table") {
    val loc = java.nio.file.Files.createTempDirectory("hpl_snap_").toString + "/t"
    val r = Hplsql.run(spark,
      s"""CREATE TABLE hpl_kv (k BIGINT, v STRING) USING snapshot LOCATION '$loc';
        |INSERT INTO hpl_kv VALUES (1, 'a'), (2, 'b');
        |FOR i IN 3..5 LOOP
        |  MERGE INTO hpl_kv t USING (SELECT i AS k, 'x' || i AS v) s
        |  ON t.k = s.k
        |  WHEN MATCHED THEN UPDATE SET v = s.v
        |  WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v);
        |END LOOP;
        |DECLARE n BIGINT;
        |SELECT count(*) INTO n FROM hpl_kv;
        |PRINT 'rows=' || n;
        |""".stripMargin)(q => graft.Engine.sql(spark, sfDir, q))
    r.printed shouldBe Seq("rows=5")
    val vs = graft.Engine.sql(spark, sfDir, "SELECT v FROM hpl_kv ORDER BY k")
      .collect().map(_.getString(0))
    vs shouldBe Array("a", "b", "x3", "x4", "x5")
    graft.plans.NamedTables.drop("hpl_kv")
  }

  test("randomized net: fast-path expression results equal Spark's") {
    val rnd = new scala.util.Random(0x5EED5EEDL)
    def lit(): String = rnd.nextInt(4) match {
      case 0 => rnd.nextInt(200).toString
      case 1 => (rnd.nextInt(400) - 200).toString
      case 2 => "'" + ("abcde".charAt(rnd.nextInt(5)).toString * (1 + rnd.nextInt(3))) + "'"
      case 3 => Seq("true", "false", "NULL")(rnd.nextInt(3))
    }
    def numExpr(depth: Int): String =
      if (depth == 0 || rnd.nextInt(3) == 0) {
        rnd.nextInt(4) match {
          case 0 => rnd.nextInt(200).toString
          case 1 => (rnd.nextInt(400) - 200).toString
          case 2 => f"${rnd.nextDouble() * 50}%.3f"
          case 3 => "NULL"
        }
      } else {
        val op = Seq("+", "-", "*", "/", "%")(rnd.nextInt(5))
        s"(${numExpr(depth - 1)} $op ${numExpr(depth - 1)})"
      }
    def boolExpr(depth: Int): String =
      if (depth == 0) {
        val op = Seq("=", "<>", "<", "<=", ">", ">=")(rnd.nextInt(6))
        s"(${numExpr(1)} $op ${numExpr(1)})"
      } else {
        rnd.nextInt(3) match {
          case 0 => s"(${boolExpr(depth - 1)} AND ${boolExpr(depth - 1)})"
          case 1 => s"(${boolExpr(depth - 1)} OR ${boolExpr(depth - 1)})"
          case 2 => s"(NOT ${boolExpr(depth - 1)})"
        }
      }
    // concat operands stay integer-only: Spark renders DECIMAL literals with
    // their declared scale ("12.300"), doubles without — a display-format
    // difference, not a value one, so keep it out of the string-compare net
    def intExpr(depth: Int): String =
      if (depth == 0) (rnd.nextInt(40) + 1).toString
      else s"(${intExpr(depth - 1)} ${Seq("+", "-", "*", "/", "%")(rnd.nextInt(5))} ${intExpr(depth - 1)})"
    def concatExpr(): String = s"(${lit()} || ${lit()} || ${intExpr(1)})"

    val exprs =
      (1 to 60).map(_ => numExpr(2)) ++
        (1 to 40).map(_ => boolExpr(2)) ++
        (1 to 20).map(_ => concatExpr())
    var fastHits = 0
    exprs.foreach { e =>
      Hplsql.FastEval.tryEval(e, _ => None).foreach { fast =>
        fastHits += 1
        val row = spark.sql(s"SELECT ($e) AS v").collect()(0)
        val sparkV = if (row.isNullAt(0)) null else row.get(0)
        val norm: Any => Any = {
          case i: Int => i.toLong
          case d: java.math.BigDecimal => d.doubleValue
          case x => x
        }
        withClue(s"expr: $e  fast=$fast spark=$sparkV\n") {
          (norm(fast), norm(sparkV)) match {
            case (a: Double, b: Double) =>
              if (a.isNaN || b.isNaN) assert(a.isNaN === b.isNaN)
              else assert(math.abs(a - b) <= math.max(1e-9, math.abs(b) * 1e-12))
            case (a, b) => assert(a === b)
          }
        }
      }
    }
    // decimal-literal expressions deliberately fall back (DECIMAL scale
    // semantics); everything else must take the fast path
    assert(fastHits > exprs.length / 4, s"fast path hit only $fastHits/${exprs.length}")
  }

  test("explicit cursors: DECLARE CURSOR / OPEN / FETCH / CLOSE with SQLCODE") {
    val r = run("""
      DECLARE c CURSOR FOR
        SELECT v, v * 10 AS w FROM VALUES (1), (2), (3) AS t(v) ORDER BY v;
      DECLARE total INT DEFAULT 0;
      DECLARE a INT; DECLARE b INT;
      OPEN c;
      FETCH c INTO a, b;
      WHILE sqlcode = 0 LOOP
        SET total = total + a + b;
        FETCH c INTO a, b;
      END LOOP;
      CLOSE c;
      PRINT 'total=' || total || ' code=' || sqlcode;
    """)
    r.printed shouldBe Seq("total=66 code=100") // (1+10)+(2+20)+(3+30)
  }

  test("cursors stream: FETCH-ing a few rows never materializes the full result") {
    import java.util.concurrent.atomic.AtomicLong
    val resultBytes = new AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          resultBytes.addAndGet(te.taskMetrics.resultSize)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // 4M bigints over 16 partitions: collect() would pull 32+ MB to the
      // driver at OPEN; toLocalIterator pulls ONE partition (~2 MB)
      val r = run("""
        DECLARE c CURSOR FOR SELECT id FROM range(0, 4000000, 1, 16);
        DECLARE x BIGINT;
        OPEN c;
        FETCH c INTO x;
        FETCH c INTO x;
        FETCH c INTO x;
        CLOSE c;
        PRINT 'got=' || x || ' code=' || sqlcode;
      """)
      r.printed shouldBe Seq("got=2 code=0")
      val deadline = System.currentTimeMillis() + 5000
      var last = -1L
      while (System.currentTimeMillis() < deadline && last != resultBytes.get()) {
        last = resultBytes.get(); Thread.sleep(200)
      }
      assert(resultBytes.get() < 8L * 1024 * 1024,
        s"cursor OPEN moved ${resultBytes.get()} bytes to the driver — " +
          "it must stream partitions, not collect()")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("cursor errors are loud: FETCH before OPEN, unknown cursor") {
    val e1 = intercept[IllegalArgumentException] {
      run("""
        DECLARE c CURSOR FOR SELECT 1;
        DECLARE x INT;
        FETCH c INTO x;
      """)
    }
    e1.getMessage should include("not open")
    val e2 = intercept[IllegalArgumentException] {
      run("OPEN nope;")
    }
    e2.getMessage should include("unknown cursor")
  }

  test("cursor queries see script variables; IS form and reopen both work") {
    val r = run("""
      DECLARE lim INT DEFAULT 2;
      DECLARE c CURSOR IS SELECT v FROM VALUES (1), (2), (3) AS t(v)
        WHERE v <= lim ORDER BY v DESC;
      DECLARE x INT; DECLARE seen STRING DEFAULT '';
      OPEN c;
      FETCH c INTO x;
      WHILE sqlcode = 0 LOOP
        SET seen = seen || x || ',';
        FETCH c INTO x;
      END LOOP;
      CLOSE c;
      OPEN c; -- reopen re-runs the query
      FETCH c INTO x;
      CLOSE c;
      PRINT seen || 'reopened=' || x;
    """)
    r.printed shouldBe Seq("2,1,reopened=2")
  }

  test("CONTINUE HANDLER FOR SQLEXCEPTION resumes after a failing statement") {
    val r = run("""
      DECLARE errs INT DEFAULT 0;
      DECLARE CONTINUE HANDLER FOR SQLEXCEPTION
      BEGIN
        SET errs = errs + 1;
        PRINT 'caught: ' || sqlerrm;
      END;
      SELECT no_such_column FROM region;
      PRINT 'still running';
      SELECT another_bad FROM region;
      PRINT 'done errs=' || errs;
    """)
    assert(r.printed.count(_.startsWith("caught:")) === 2)
    assert(r.printed.contains("still running"))
    assert(r.printed.contains("done errs=2"))
    r.variables("errs") shouldBe 2
  }

  test("EXIT HANDLER seals the block that declared it, not the program") {
    val r = run("""
      PRINT 'before';
      BEGIN
        DECLARE EXIT HANDLER FOR SQLEXCEPTION PRINT 'handled';
        SELECT boom FROM region;
        PRINT 'unreachable';
      END;
      PRINT 'after';
    """)
    r.printed shouldBe Seq("before", "handled", "after")
  }

  test("CONTINUE HANDLER FOR NOT FOUND drives the classic fetch-until loop") {
    val r = run("""
      DECLARE done INT DEFAULT 0;
      DECLARE n INT DEFAULT 0;
      DECLARE nm STRING;
      DECLARE CONTINUE HANDLER FOR NOT FOUND SET done = 1;
      DECLARE c CURSOR FOR SELECT r_name FROM region ORDER BY r_name;
      OPEN c;
      WHILE done = 0 LOOP
        FETCH c INTO nm;
        IF done = 0 THEN SET n = n + 1; END IF;
      END LOOP;
      CLOSE c;
      PRINT 'rows=' || n;
    """)
    r.printed shouldBe Seq("rows=5")
    r.variables("done") shouldBe 1
  }

  test("NOT FOUND also fires on a row-less SELECT INTO; sqlcode tracks it") {
    val r = run("""
      DECLARE flag INT DEFAULT 0;
      DECLARE v STRING DEFAULT 'unset';
      DECLARE CONTINUE HANDLER FOR NOT FOUND SET flag = 1;
      SELECT r_name INTO v FROM region WHERE r_regionkey = 999;
      PRINT 'flag=' || flag || ' sqlcode=' || sqlcode;
      SELECT r_name INTO v FROM region WHERE r_regionkey = 0;
      PRINT 'sqlcode=' || sqlcode || ' v=' || v;
    """)
    r.printed shouldBe Seq("flag=1 sqlcode=100", "sqlcode=0 v=AFRICA")
  }

  test("without a handler the exception still propagates") {
    intercept[Exception] {
      run("SELECT boom FROM region; PRINT 'nope';")
    }
  }

  test("an inner WHEN OTHERS cannot swallow an outer EXIT handler's seal") {
    val r = run("""
      BEGIN
        DECLARE EXIT HANDLER FOR SQLEXCEPTION PRINT 'sealed';
        BEGIN
          SELECT bad FROM region;
        EXCEPTION WHEN OTHERS THEN PRINT 'when_others';
        END;
        PRINT 'mid';
        SELECT bad2 FROM region;
        PRINT 'unreachable';
      END;
      PRINT 'after';
    """)
    // the inner failure is the inner block's (WHEN OTHERS); the second
    // failure reaches the outer EXIT handler, whose seal must NOT be
    // consumed by anything on the way out
    r.printed shouldBe Seq("when_others", "mid", "sealed", "after")
  }

  test("CONTINUE handler resumes the NEXT statement inside a loop body") {
    val r = run("""
      DECLARE errs INT DEFAULT 0;
      DECLARE done INT DEFAULT 0;
      DECLARE i INT DEFAULT 0;
      DECLARE CONTINUE HANDLER FOR SQLEXCEPTION SET errs = errs + 1;
      WHILE i < 4 LOOP
        IF i = 2 THEN SELECT boom FROM region; END IF;
        SET done = done + 1;
        SET i = i + 1;
      END LOOP;
      PRINT 'done=' || done || ' errs=' || errs;
    """)
    // the i=2 failure skips only ITS statement; the iteration and the
    // remaining iterations still run
    r.printed shouldBe Seq("done=4 errs=1")
  }

  test("inner handler wins; outer handler covers blocks without one") {
    val r = run("""
      DECLARE CONTINUE HANDLER FOR SQLEXCEPTION PRINT 'outer';
      BEGIN
        DECLARE CONTINUE HANDLER FOR SQLEXCEPTION PRINT 'inner';
        SELECT bad1 FROM region;
      END;
      BEGIN
        SELECT bad2 FROM region;
      END;
      PRINT 'end';
    """)
    r.printed shouldBe Seq("inner", "outer", "end")
  }

  test("the SQL front door runs procedural scripts directly") {
    val df = graft.Engine.sql(spark, sfDir,
      """DECLARE n BIGINT;
        |SELECT count(*) INTO n FROM customer;
        |PRINT 'customers: ' || n;
        |SELECT c_mktsegment, count(*) AS cnt FROM customer
        |GROUP BY c_mktsegment ORDER BY c_mktsegment;
        |""".stripMargin)
    // last row-producing statement is the script's result
    df.columns.toSeq shouldBe Seq("c_mktsegment", "cnt")
    df.collect().map(_.getLong(1)).sum should be > 0L
    // print-only scripts return the printed lines
    val printed = graft.Engine.sql(spark, sfDir,
      "DECLARE x INT DEFAULT 6; PRINT 'val ' || x * 7;")
    printed.collect().map(_.getString(0)).toSeq shouldBe Seq("val 42")
    // plain SQL typos still surface the canonical parse error
    an[Exception] should be thrownBy
      graft.Engine.sql(spark, sfDir, "SELEC 1")
  }

  test("scripts drive engine tables end-to-end") {
    val r = run(s"""
      DECLARE seg STRING DEFAULT 'BUILDING';
      DECLARE cnt BIGINT;
      SELECT count(*) INTO cnt
      FROM parquet.`$sfDir/customer.parquet` WHERE c_mktsegment = seg;
      IF cnt > 0 THEN PRINT 'seg ' || seg || ' -> ' || cnt;
      ELSE PRINT 'empty'; END IF;
    """)
    r.printed.head should startWith("seg BUILDING -> ")
  }

  test("packages: state shared across calls, spec + body, member functions") {
    val r = run("""
      CREATE PACKAGE Counter AS
        cnt INT := 0;
        step INT := 2;
        PROCEDURE inc(i INT);
        FUNCTION current() RETURNS INT;
      END;
      CREATE PACKAGE BODY Counter AS
        PROCEDURE inc(i INT)
        BEGIN
          cnt := cnt + i * step;
        END;
        FUNCTION current() RETURNS INT
        BEGIN
          RETURN cnt;
        END;
      END;
      CALL Counter.inc(1);
      CALL Counter.inc(3);
      PRINT 'count=' || Counter.current();
    """)
    // two calls accumulated into the SAME package variable: 1*2 + 3*2
    r.printed shouldBe Seq("count=8")
  }

  test("packages: routines in the spec, replace resets state, unknown members error") {
    // implementations directly in the spec (no separate body) work too
    val r = run("""
      CREATE PACKAGE acc AS
        total INT := 100;
        PROCEDURE add(v INT) BEGIN total := total + v; END;
        FUNCTION get() RETURNS INT BEGIN RETURN total; END;
      END;
      CALL acc.add(11);
      PRINT acc.get();
      CREATE OR REPLACE PACKAGE acc AS
        total INT := 0;
        FUNCTION get() RETURNS INT BEGIN RETURN total; END;
      END;
      PRINT acc.get();
    """)
    r.printed shouldBe Seq("111", "0")
    the[IllegalArgumentException] thrownBy run("""
      CREATE PACKAGE p1 AS x INT := 1; END;
      CALL p1.nope();
    """) should have message "unknown procedure nope in package p1"
    the[IllegalArgumentException] thrownBy run(
      "CALL ghost.proc();") should have message "unknown package ghost"
    // duplicate spec without OR REPLACE refuses
    an[IllegalArgumentException] should be thrownBy run("""
      CREATE PACKAGE dup AS x INT := 1; END;
      CREATE PACKAGE dup AS x INT := 2; END;
    """)
  }

  test("package member reads script SQL: package vars substitute in queries") {
    val r = run(s"""
      CREATE PACKAGE q AS
        seg STRING := 'BUILDING';
        FUNCTION segcount() RETURNS BIGINT
        BEGIN
          DECLARE n BIGINT;
          SELECT count(*) INTO n
          FROM parquet.`$sfDir/customer.parquet` WHERE c_mktsegment = seg;
          RETURN n;
        END;
      END;
      PRINT 'n=' || q.segcount();
    """)
    r.printed.head should startWith("n=")
    r.printed.head should not be "n="
  }
}
