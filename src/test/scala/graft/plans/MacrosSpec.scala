package graft.plans

import graft.{Engine, SparkSpec}

/** CREATE TEMPORARY MACRO — inline-expanded, type-inferred SQL macros. */
class MacrosSpec extends SparkSpec {

  private def sql(q: String) = Engine.sql(spark, sfDir, q)

  test("macro expands inline with parameter substitution") {
    sql("CREATE TEMPORARY MACRO m_sigmoid(x DOUBLE) 1.0 / (1.0 + exp(-x))")
    val v = sql("SELECT m_sigmoid(0.0) AS s").head.getDouble(0)
    assert(v === 0.5)
    val rows = sql(
      "SELECT m_sigmoid(t.v) AS s FROM VALUES (-1.0), (1.0) AS t(v) ORDER BY s")
      .collect().map(_.getDouble(0))
    assert(math.abs(rows(0) - 1.0 / (1.0 + math.exp(1.0))) < 1e-12)
    assert(math.abs(rows(0) + rows(1) - 1.0) < 1e-12) // sigmoid symmetry
  }

  test("arguments cast to the declared parameter type (Hive coercion)") {
    sql("CREATE TEMPORARY MACRO m_cents(amt DECIMAL(10,2)) CAST(amt * 100 AS BIGINT)")
    // string argument coerces through DECIMAL(10,2)
    assert(sql("SELECT m_cents('12.345') AS c").head.getLong(0) === 1235L)
    assert(sql("SELECT m_cents(7) AS c").head.getLong(0) === 700L)
  }

  test("zero-arg macros and composition (macro calling macro)") {
    sql("CREATE TEMPORARY MACRO m_base() 40")
    sql("CREATE TEMPORARY MACRO m_plus2(x INT) x + 2")
    assert(sql("SELECT m_plus2(m_base()) AS v").head.getInt(0) === 42)
  }

  test("expansion is pre-analysis: constant calls fold to literals in the plan") {
    sql("CREATE TEMPORARY MACRO m_twice(x INT) x * 2")
    val df = sql("SELECT m_twice(21) AS v")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("42")) // folded, no function call survives
    assert(!optimized.toLowerCase.contains("m_twice"))
  }

  test("wrong arity and missing macro fail loud; DROP removes, IF EXISTS tolerates") {
    sql("CREATE TEMPORARY MACRO m_one(x INT) x + 1")
    intercept[Exception] { sql("SELECT m_one(1, 2)").collect() }
    sql("DROP TEMPORARY MACRO m_one")
    intercept[Exception] { sql("SELECT m_one(1)").collect() }
    intercept[IllegalArgumentException] { sql("DROP TEMPORARY MACRO m_one") }
    sql("DROP TEMPORARY MACRO IF EXISTS m_one") // no-op, no throw
    // DROP TEMPORARY MACRO must not delete a builtin sharing the name
    intercept[IllegalArgumentException] { sql("DROP TEMPORARY MACRO lower") }
    sql("DROP TEMPORARY MACRO IF EXISTS lower")
    assert(sql("SELECT lower('AB') AS v").head.getString(0) === "ab")
  }

  test("macros capture definitions at CREATE; redefinition cycles cannot form") {
    sql("CREATE TEMPORARY MACRO m_a(x INT) x + 1")
    sql("CREATE TEMPORARY MACRO m_b(x INT) m_a(x) * 10")
    // redefine m_a THROUGH m_b: the reference's capture semantics mean
    // m_b keeps the OLD m_a (+1), and the new m_a gets old-m_b inlined —
    // no cycle, both stay callable
    sql("CREATE TEMPORARY MACRO m_a(x INT) m_b(x) + 100")
    assert(sql("SELECT m_b(5) AS v").head.getInt(0) === 60) // (5+1)*10
    assert(sql("SELECT m_a(5) AS v").head.getInt(0) === 160) // 60+100
    // direct self-reference is rejected at definition
    intercept[IllegalArgumentException] {
      sql("CREATE TEMPORARY MACRO m_self(x INT) m_self(x) + 1")
    }
  }

  test("typed parens in the parameter list parse (DECIMAL(10,2) stays whole)") {
    sql("CREATE TEMPORARY MACRO m_net(amount DECIMAL(10,2), rate DECIMAL(4,2)) " +
      "CAST(amount * (1 - rate) AS DECIMAL(12,2))")
    val v = sql("SELECT m_net(100.00, 0.25) AS n").head.getDecimal(0)
    assert(v.toPlainString === "75.00")
  }
}
