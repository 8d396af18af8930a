package graft

import org.scalatest.funsuite.AnyFunSuite

/** Authoring-time net for the recurring oracle-typing slip: DuckDB types a
  * bare `sum(BIGINT)` as HUGEINT, which round-trips as float64 while Spark
  * emits int64 — the driver's representation-sensitive hash then FAILS a
  * value-identical answer (round 9's f32/s27 red rows). Every oracle is
  * DESCRIBEd in DuckDB (planning only, no data scan) and any HUGEINT
  * column fails the build with the fix spelled out. The full Spark-vs-
  * DuckDB dtype-class parity runs in tools/check.py on every verify pass;
  * this spec is the cheap front line that catches the slip at `sbt test`
  * time, before a driver round ever sees it.
  */
class OracleTypeParitySpec extends AnyFunSuite {

  test("no oracle query types a column as HUGEINT (bare-sum lint)") {
    // the FIRST python3 with duckdb importable wins (pyenv shims first —
    // plain "python3" resolves through PATH inside ProcessBuilder too)
    val python = Seq("python3", "/root/.pyenv/shims/python3",
        "/usr/bin/python3", "/usr/local/bin/python3")
      .find { p =>
        try new ProcessBuilder(p, "-c", "import duckdb").start()
          .waitFor() == 0
        catch { case _: Exception => false }
      }
    assume(python.isDefined, "python3 + duckdb not available in this environment")

    // dump SparkEntry.oracleSql exactly as Verify does
    val oracles = SparkEntry.oracleSql
    val json = oracles.toSeq.sortBy(_._1).map { case (k, v) =>
      val esc = v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\r", "")
      s""""$k": "$esc""""
    }.mkString("{", ",", "}")
    val tmp = java.nio.file.Files.createTempFile("oracles_", ".json")
    java.nio.file.Files.write(tmp, json.getBytes("UTF-8"))

    val proc = new ProcessBuilder(python.get, "tools/oracle_typelint.py",
      "/root/testdata/sf0.001", tmp.toString)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    assert(code == 0,
      s"oracle type lint found offenders (exit $code):\n$out")
  }
}
