package graft

/** Qtest conformance, vectorization family RESULT rows: the reference's
  * `vectorization_*.q` / `vectorized_math_funcs.q` files exist to verify
  * the vectorized operators answer exactly what the row pipeline does —
  * here the engine's Tungsten path answers against DuckDB over the
  * canonical 12,288-row alltypesorc dataset. Plus `udf_bround.q`
  * (HALF_EVEN banker's rounding, twin = DuckDB's round_even) and
  * `cast1.q`'s arithmetic-coercion row.
  *
  * Porting notes:
  *  - vectorization_1.q's filter compares `cboolean2 > 0` — Hive resolves
  *    cross-group comparisons; the port spells `CAST(cboolean2 AS INT)`
  *    per the explicit-coercion porting rule.
  *  - math functions restrict to the positive domain in BOTH texts:
  *    Hive/Spark answer NULL for ln/log/sqrt of non-positive inputs where
  *    DuckDB hard-errors — that NULL contract is pinned separately by vmn
  *    (transcribed Hive semantics, GenericUDFLn's null-on-nonpositive).
  */
class QtestVectorSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("vectorization_0.q", "v0a",
      """SELECT min(ctinyint) AS c1, max(ctinyint) AS c2,
        |  count(ctinyint) AS c3, count(*) AS c4
        |FROM qt_alltypesorc""".stripMargin),
    QCase("vectorization_0.q", "v0b",
      "SELECT sum(ctinyint) AS c1 FROM qt_alltypesorc"),
    QCase("vectorization_0.q", "v0c",
      """SELECT avg(ctinyint) AS c1,
        |  variance(ctinyint) AS c2, var_pop(ctinyint) AS c3,
        |  var_samp(ctinyint) AS c4, std(ctinyint) AS c5,
        |  stddev(ctinyint) AS c6, stddev_pop(ctinyint) AS c7,
        |  stddev_samp(ctinyint) AS c8
        |FROM qt_alltypesorc""".stripMargin,
      duck = Some("""SELECT avg(ctinyint) AS c1,
        |  var_pop(ctinyint) AS c2, var_pop(ctinyint) AS c3,
        |  var_samp(ctinyint) AS c4, stddev_pop(ctinyint) AS c5,
        |  stddev_pop(ctinyint) AS c6, stddev_pop(ctinyint) AS c7,
        |  stddev_samp(ctinyint) AS c8
        |FROM qt_alltypesorc""".stripMargin),
      note = "Hive std/stddev/variance = POPULATION forms (the r13 " +
        "finding, here re-pinned on the vectorization corpus)"),
    QCase("vectorization_0.q", "v0d",
      """SELECT sum(cfloat) AS c1, avg(cfloat) AS c2,
        |  min(cfloat) AS c3, max(cfloat) AS c4
        |FROM qt_alltypesorc""".stripMargin),
    QCase("vectorization_1.q", "v1",
      """SELECT var_pop(ctinyint) AS c1,
        |  (var_pop(ctinyint) / -26.28) AS c2,
        |  sum(cfloat) AS c3,
        |  (-1.389 + sum(cfloat)) AS c4,
        |  (sum(cfloat) * (-1.389 + sum(cfloat))) AS c5,
        |  max(ctinyint) AS c6,
        |  max(cint) AS c7,
        |  (max(cint) * 79.553) AS c8,
        |  var_samp(cdouble) AS c9,
        |  count(cint) AS c10,
        |  (-563 % max(cint)) AS c11
        |FROM qt_alltypesorc
        |WHERE ((cdouble > ctinyint AND CAST(cboolean2 AS INT) > 0)
        |  OR (cbigint < ctinyint
        |    OR (cint > cbigint OR CAST(cboolean1 AS INT) < 0)))"""
        .stripMargin,
      duck = Some("""SELECT var_pop(ctinyint) AS c1,
        |  (var_pop(ctinyint) / -26.28) AS c2,
        |  sum(cfloat) AS c3,
        |  (-1.389 + sum(cfloat)) AS c4,
        |  (sum(cfloat) * (-1.389 + sum(cfloat))) AS c5,
        |  max(ctinyint) AS c6,
        |  max(cint) AS c7,
        |  (max(cint) * 79.553) AS c8,
        |  var_samp(cdouble) AS c9,
        |  count(cint) AS c10,
        |  (-563 % max(cint)) AS c11
        |FROM qt_alltypesorc
        |WHERE ((cdouble > ctinyint AND CAST(cboolean2 AS INT) > 0)
        |  OR (cbigint < ctinyint
        |    OR (cint > cbigint OR CAST(cboolean1 AS INT) < 0)))"""
        .stripMargin),
      note = "the mixed aggregate-expression block over a multi-branch " +
        "coerced filter (boolean comparisons spelled as CASTs)"),
    QCase("vectorized_math_funcs.q", "vm1",
      """SELECT cdouble, round(cdouble, 2) AS r2, floor(cdouble) AS fl,
        |  ceil(cdouble) AS ce, exp(ln(cdouble)) AS ex, ln(cdouble) AS ln1,
        |  log10(cdouble) AS l10, log2(cdouble) AS l2,
        |  sqrt(cdouble) AS sq, bin(cbigint) AS bn
        |FROM qt_alltypesorc
        |WHERE cbigint % 500 = 0 AND cdouble > 0 AND cbigint > 0
        |ORDER BY cdouble""".stripMargin, ordered = true),
    QCase("vectorized_math_funcs.q", "vm2",
      """SELECT cdouble, abs(cdouble) AS ab, sign(cdouble) AS sg,
        |  cos(cdouble / 10000) AS co, sin(cdouble / 10000) AS si,
        |  atan(cdouble / 10000) AS at, degrees(cdouble / 10000) AS dg,
        |  radians(cdouble / 10000) AS rd
        |FROM qt_alltypesorc
        |WHERE cbigint % 500 = 0 AND cdouble IS NOT NULL
        |ORDER BY cdouble""".stripMargin, ordered = true,
      duck = Some("""SELECT cdouble, abs(cdouble) AS ab,
        |  sign(cdouble) AS sg,
        |  cos(cdouble / 10000) AS co, sin(cdouble / 10000) AS si,
        |  atan(cdouble / 10000) AS at, degrees(cdouble / 10000) AS dg,
        |  radians(cdouble / 10000) AS rd
        |FROM qt_alltypesorc
        |WHERE cbigint % 500 = 0 AND cdouble IS NOT NULL
        |ORDER BY cdouble NULLS FIRST""".stripMargin)),
    QCase("vectorized_math_funcs.q", "vmn",
      "SELECT ln(0.0) AS a, ln(-1.0) AS b, log2(-2.0) AS c, " +
        "sqrt(-1.0) AS d",
      duck = Some(""),
      hive = Some(Seq("NULL", "NULL", "NULL", "NULL")),
      note = "non-positive math domains answer NULL in Hive " +
        "(GenericUDFLn guards <= 0; UDFSqrt.java:45 NULLs negative " +
        "input — the r16 sqrt registration fixed the engine's " +
        "former NaN here) where DuckDB hard-errors — transcribed " +
        "Hive semantics are the gate"),

    QCase("udf_bround.q", "br1",
      """SELECT bround(2.5) AS a, bround(3.5) AS b, bround(2.49) AS c,
        |  bround(3.49) AS d, bround(2.51) AS e, bround(3.51) AS f"""
        .stripMargin,
      duck = Some("""SELECT round_even(2.5, 0) AS a, round_even(3.5, 0)
        |  AS b, round_even(2.49, 0) AS c, round_even(3.49, 0) AS d,
        |  round_even(2.51, 0) AS e, round_even(3.51, 0) AS f"""
        .stripMargin),
      note = "banker's rounding: halves go to the EVEN neighbor"),
    QCase("udf_bround.q", "br2",
      """SELECT bround(1.25, 1) AS a, bround(1.35, 1) AS b,
        |  bround(-1.25, 1) AS c, bround(-1.35, 1) AS d,
        |  bround(55.0, -1) AS e, bround(45.0, -1) AS f""".stripMargin,
      duck = Some("""SELECT round_even(1.25, 1) AS a,
        |  round_even(1.35, 1) AS b, round_even(-1.25, 1) AS c,
        |  round_even(-1.35, 1) AS d, round_even(55.0, -1) AS e,
        |  round_even(45.0, -1) AS f""".stripMargin),
      note = "scaled and negative-scale banker's rounding"),

    QCase("cast1.q", "c1",
      """SELECT 3 + 2 AS a, 3.0 + 2 AS b, 3 + 2.0 AS c, 3.0 + 2.0 AS d,
        |  3 + CAST(2.0 AS INT) + CAST(CAST(0 AS SMALLINT) AS INT) AS e,
        |  CAST(1 AS BOOLEAN) AS f, CAST(TRUE AS INT) AS g""".stripMargin,
      note = "the arithmetic type-coercion row: int+decimal widens, " +
        "1->boolean is true, true->int is 1"))

  test("qtest conformance: vectorization family result rows " +
      "(aggregate expression blocks, math functions, coerced filters)") {
    run("vectorization_", "vectorized_")
  }
  test("qtest conformance: banker's rounding and the cast1 coercion row") {
    run("udf_bround", "cast1")
  }
}
