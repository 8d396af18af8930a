package graft

/** Conformance wave 17s: the vectorization_{2..17} battery + div0 (ref
  * ql/src/test/queries/clientpositive/vectorization_*.q). Each file
  * pins the RESULTS of Hive's vectorized row-batch path on one
  * machine-generated query over alltypesorc — deep aggregate
  * arithmetic over gnarly filter trees. Vectorization itself is
  * Tungsten's job; what gates here is every expression edge the
  * filters exercise:
  *
  *  - TIMESTAMP-vs-NUMERIC comparisons = double epoch seconds
  *    (TimestampComparisons; twins spell epoch_us()/1e6),
  *  - BOOLEAN-vs-NUMERIC comparisons = both sides to DOUBLE with
  *    true=1.0 (ref GenericUDFBaseCompare.java:152 "always convert to
  *    double"; the r17 [[graft.plans.BooleanComparisons]] — Spark
  *    rejects these outright; vectorization_6/12/13 all use them),
  *  - float/double modulo, unary negation towers, NULL-propagating
  *    aggregate arithmetic, var/std population-vs-sample families,
  *  - division by zero answers NULL, never an error
  *    (vectorization_div0.q).
  */
class QtestVectorizationWave17sSpec extends QtestHarness {

  private val T = "qt_alltypesorc"
  // the duck spelling of Hive's timestamp-as-double-epoch-seconds
  private def ep(c: String) = s"(CAST(epoch_us($c) AS DOUBLE) / 1000000)"

  protected val qcases: Seq[QCase] = Seq(

    QCase("vectorization_2.q", "w17s02",
      s"""SELECT AVG(csmallint) AS c1, (AVG(csmallint) % -563) AS c2,
         |  (AVG(csmallint) + 762) AS c3, SUM(cfloat) AS c4,
         |  VAR_POP(cbigint) AS c5, (-(VAR_POP(cbigint))) AS c6,
         |  (SUM(cfloat) - AVG(csmallint)) AS c7, COUNT(*) AS c8,
         |  (-((SUM(cfloat) - AVG(csmallint)))) AS c9,
         |  (VAR_POP(cbigint) - 762) AS c10, MIN(ctinyint) AS c11,
         |  ((-(VAR_POP(cbigint))) + MIN(ctinyint)) AS c12,
         |  AVG(cdouble) AS c13,
         |  (((-(VAR_POP(cbigint))) + MIN(ctinyint)) - SUM(cfloat)) AS c14
         |FROM $T
         |WHERE (((ctimestamp1 < ctimestamp2)
         |  AND ((cstring2 LIKE 'b%') AND (cfloat <= -5638.15)))
         |  OR ((cdouble < ctinyint)
         |    AND ((-10669 != ctimestamp2) OR (359 > cint))))"""
        .stripMargin,
      duck = Some(s"""SELECT AVG(csmallint) AS c1,
         |  (AVG(csmallint) % -563) AS c2,
         |  (AVG(csmallint) + 762) AS c3, SUM(cfloat) AS c4,
         |  VAR_POP(cbigint) AS c5, (-(VAR_POP(cbigint))) AS c6,
         |  (SUM(cfloat) - AVG(csmallint)) AS c7, COUNT(*) AS c8,
         |  (-((SUM(cfloat) - AVG(csmallint)))) AS c9,
         |  (VAR_POP(cbigint) - 762) AS c10, MIN(ctinyint) AS c11,
         |  ((-(VAR_POP(cbigint))) + MIN(ctinyint)) AS c12,
         |  AVG(cdouble) AS c13,
         |  (((-(VAR_POP(cbigint))) + MIN(ctinyint)) - SUM(cfloat)) AS c14
         |FROM $T
         |WHERE (((ctimestamp1 < ctimestamp2)
         |  AND ((cstring2 LIKE 'b%') AND (cfloat <= -5638.15)))
         |  OR ((cdouble < ctinyint)
         |    AND ((-10669 != ${ep("ctimestamp2")}) OR (359 > cint))))"""
        .stripMargin),
      note = "aggregate arithmetic tower; -10669 != ctimestamp2 " +
        "compares double epoch seconds"),

    QCase("vectorization_3.q", "w17s03",
      s"""SELECT STDDEV_SAMP(csmallint) AS c1,
         |  (STDDEV_SAMP(csmallint) - 10.175) AS c2,
         |  STDDEV_POP(ctinyint) AS c3,
         |  (STDDEV_SAMP(csmallint) * (STDDEV_SAMP(csmallint) - 10.175)) AS c4,
         |  (-(STDDEV_POP(ctinyint))) AS c5,
         |  (STDDEV_SAMP(csmallint) % 79.553) AS c6,
         |  STDDEV_SAMP(cfloat) AS c7, SUM(cfloat) AS c8,
         |  AVG(cint) AS c9, (-3728 - STDDEV_SAMP(csmallint)) AS c10,
         |  STDDEV_POP(cint) AS c11,
         |  (AVG(cint) / STDDEV_SAMP(cfloat)) AS c12
         |FROM $T
         |WHERE (((cint <= cfloat)
         |  AND ((79.553 != cbigint) AND (ctimestamp2 = -29071)))
         |  OR ((cbigint > cdouble)
         |    AND ((79.553 <= csmallint) AND (ctimestamp1 > ctimestamp2))))"""
        .stripMargin,
      duck = Some(s"""SELECT STDDEV_SAMP(csmallint) AS c1,
         |  (STDDEV_SAMP(csmallint) - 10.175) AS c2,
         |  STDDEV_POP(ctinyint) AS c3,
         |  (STDDEV_SAMP(csmallint) * (STDDEV_SAMP(csmallint) - 10.175)) AS c4,
         |  (-(STDDEV_POP(ctinyint))) AS c5,
         |  (STDDEV_SAMP(csmallint) % 79.553) AS c6,
         |  STDDEV_SAMP(cfloat) AS c7, SUM(cfloat) AS c8,
         |  AVG(cint) AS c9, (-3728 - STDDEV_SAMP(csmallint)) AS c10,
         |  STDDEV_POP(cint) AS c11,
         |  (AVG(cint) / STDDEV_SAMP(cfloat)) AS c12
         |FROM $T
         |WHERE (((cint <= cfloat)
         |  AND ((79.553 != cbigint) AND (${ep("ctimestamp2")} = -29071)))
         |  OR ((cbigint > cdouble)
         |    AND ((79.553 <= csmallint) AND (ctimestamp1 > ctimestamp2))))"""
        .stripMargin),
      note = "stddev sample/pop mix under a ts=-29071 epoch filter"),

    QCase("vectorization_4.q", "w17s04",
      s"""SELECT SUM(cint) AS c1, (SUM(cint) * -563) AS c2,
         |  (-3728 + SUM(cint)) AS c3, STDDEV_POP(cdouble) AS c4,
         |  AVG(cdouble) AS c5,
         |  ((SUM(cint) * -563) % SUM(cint)) AS c6,
         |  (((SUM(cint) * -563) % SUM(cint)) / AVG(cdouble)) AS c7,
         |  VAR_POP(cdouble) AS c8,
         |  ((-3728 + SUM(cint)) - (SUM(cint) * -563)) AS c9,
         |  MIN(ctinyint) AS c10
         |FROM $T
         |WHERE (((csmallint >= cint)
         |  OR ((-89010 >= ctinyint) AND (cdouble > 79.553)))
         |  OR ((-563 != cbigint)
         |    AND ((ctinyint != cbigint) OR (-3728 >= cdouble))))"""
        .stripMargin,
      note = "bigint modulo of products; pure numeric filter tree"),

    QCase("vectorization_5.q", "w17s05",
      s"""SELECT MAX(csmallint) AS c1, (MAX(csmallint) * -75) AS c2,
         |  COUNT(*) AS c3,
         |  ((MAX(csmallint) * -75) / COUNT(*)) AS c4,
         |  (6981 * MAX(csmallint)) AS c5, MIN(csmallint) AS c6,
         |  (-(MIN(csmallint))) AS c7,
         |  (197 % ((MAX(csmallint) * -75) / COUNT(*))) AS c8,
         |  SUM(cint) AS c9, MAX(ctinyint) AS c10,
         |  (-(MAX(ctinyint))) AS c11,
         |  ((-(MAX(ctinyint))) + MAX(ctinyint)) AS c12
         |FROM $T
         |WHERE (((cboolean2 IS NOT NULL) AND (cstring1 LIKE '%b%'))
         |  OR ((ctinyint = cdouble)
         |    AND ((ctimestamp2 IS NOT NULL) AND (cstring2 LIKE 'a'))))"""
        .stripMargin,
      duck = Some(s"""SELECT MAX(csmallint) AS c1,
         |  (CAST(MAX(csmallint) AS INT) * -75) AS c2, COUNT(*) AS c3,
         |  (CAST(MAX(csmallint) AS INT) * -75 / COUNT(*)) AS c4,
         |  (6981 * CAST(MAX(csmallint) AS INT)) AS c5,
         |  MIN(csmallint) AS c6, (-(MIN(csmallint))) AS c7,
         |  (197 % (CAST(MAX(csmallint) AS INT) * -75 / COUNT(*))) AS c8,
         |  SUM(cint) AS c9, MAX(ctinyint) AS c10,
         |  (-(MAX(ctinyint))) AS c11,
         |  ((-(MAX(ctinyint))) + MAX(ctinyint)) AS c12
         |FROM $T
         |WHERE (((cboolean2 IS NOT NULL) AND (cstring1 LIKE '%b%'))
         |  OR ((ctinyint = cdouble)
         |    AND ((ctimestamp2 IS NOT NULL) AND (cstring2 LIKE 'a'))))"""
        .stripMargin),
      note = "int aggregate arithmetic with integer-division and " +
        "modulo chains (Hive widens smallint*int to INT; DuckDB's " +
        "strict INT16 overflow needs the explicit widening)"),

    QCase("vectorization_6.q", "w17s06",
      s"""SELECT cboolean1, cfloat, cstring1,
         |  (988888 * csmallint) AS c1, (-(csmallint)) AS c2,
         |  (-(cfloat)) AS c3, (-26.28 / cfloat) AS c4,
         |  (cfloat * 359) AS c5, (cint % ctinyint) AS c6,
         |  (-(cdouble)) AS c7, (ctinyint - -75) AS c8,
         |  (762 * (cint % ctinyint)) AS c9
         |FROM $T
         |WHERE ((ctinyint != 0)
         |  AND ((((cboolean1 <= 0) AND (cboolean2 >= cboolean1))
         |    OR ((cbigint IS NOT NULL)
         |      AND ((cstring2 LIKE '%a') OR (cfloat <= -257))))))"""
        .stripMargin,
      duck = Some(s"""SELECT cboolean1, cfloat, cstring1,
         |  (((988888 * CAST(csmallint AS BIGINT) + 2147483648)
         |     % 4294967296 + 4294967296) % 4294967296
         |     - 2147483648) AS c1,
         |  (-(csmallint)) AS c2,
         |  (-(cfloat)) AS c3, (-26.28 / cfloat) AS c4,
         |  (cfloat * 359) AS c5, (cint % ctinyint) AS c6,
         |  (-(cdouble)) AS c7, (CAST(ctinyint AS INT) - -75) AS c8,
         |  (762 * (CAST(cint AS BIGINT) % ctinyint)) AS c9
         |FROM $T
         |WHERE ((ctinyint != 0)
         |  AND ((((CAST(cboolean1 AS INT) <= 0)
         |      AND (cboolean2 >= cboolean1))
         |    OR ((cbigint IS NOT NULL)
         |      AND ((cstring2 LIKE '%a') OR (cfloat <= -257))))))"""
        .stripMargin),
      note = "cboolean1 <= 0 converts BOTH sides to double (r17 " +
        "BooleanComparisons); Spark alone rejects the comparison"),

    QCase("vectorization_7.q", "w17s07",
      s"""SELECT cboolean1, cbigint, csmallint, ctinyint, ctimestamp1,
         |  cstring1,
         |  (cbigint + cbigint) as c1, (csmallint % -257) as c2,
         |  (-(csmallint)) as c3, (-(ctinyint)) as c4,
         |  ((-(ctinyint)) + 17) as c5, (cbigint * (-(csmallint))) as c6,
         |  (cint % csmallint) as c7, (-(ctinyint)) as c8,
         |  ((-(ctinyint)) % ctinyint) as c9
         |FROM $T
         |WHERE ((ctinyint != 0)
         |  AND (((ctimestamp1 <= -28800)
         |    OR ((ctinyint = cint) OR (cstring2 LIKE 'ss')))
         |  AND ((988888 < cdouble)
         |    OR ((ctimestamp2 > -28815) AND (3569 >= cdouble)))))
         |ORDER BY cboolean1, cbigint, csmallint, ctinyint, ctimestamp1,
         |  cstring1, c1, c2, c3, c4, c5, c6, c7, c8, c9
         |LIMIT 25""".stripMargin,
      duck = Some(s"""SELECT cboolean1, cbigint, csmallint, ctinyint,
         |  ctimestamp1, cstring1,
         |  (cbigint + cbigint) as c1, (csmallint % -257) as c2,
         |  (-(csmallint)) as c3, (-(ctinyint)) as c4,
         |  ((-(ctinyint)) + 17) as c5, (cbigint * (-(csmallint))) as c6,
         |  (cint % csmallint) as c7, (-(ctinyint)) as c8,
         |  ((-(ctinyint)) % ctinyint) as c9
         |FROM $T
         |WHERE ((ctinyint != 0)
         |  AND (((${ep("ctimestamp1")} <= -28800)
         |    OR ((ctinyint = cint) OR (cstring2 LIKE 'ss')))
         |  AND ((988888 < cdouble)
         |    OR ((${ep("ctimestamp2")} > -28815) AND (3569 >= cdouble)))))
         |ORDER BY cboolean1, cbigint, csmallint, ctinyint, ctimestamp1,
         |  cstring1, c1, c2, c3, c4, c5, c6, c7, c8, c9
         |LIMIT 25""".stripMargin),
      ordered = true,
      note = "projection battery under two epoch-seconds timestamp " +
        "bounds; full-width ORDER BY pins the limit"),

    QCase("vectorization_8.q", "w17s08",
      s"""SELECT ctimestamp1, cdouble, cboolean1, cstring1, cfloat,
         |  (-(cdouble)) as c1, (-5638.15 - cdouble) as c2,
         |  (cdouble * -257) as c3, (cint + cfloat) as c4,
         |  ((-(cdouble)) + cbigint) as c5, (-(cdouble)) as c6,
         |  (-1.389 - cfloat) as c7, (-(cfloat)) as c8,
         |  ((-5638.15 - cdouble) + (cint + cfloat)) as c9
         |FROM $T
         |WHERE (((cstring2 IS NOT NULL)
         |  AND ((ctimestamp1 <= 10) AND (ctimestamp2 != 16)))
         |  OR ((cfloat < -6432)
         |    OR ((cboolean1 IS NOT NULL) AND (cdouble = 988888))))
         |ORDER BY ctimestamp1, cdouble, cboolean1, cstring1, cfloat,
         |  c1, c2, c3, c4, c5, c6, c7, c8, c9
         |LIMIT 20""".stripMargin,
      duck = Some(s"""SELECT ctimestamp1, cdouble, cboolean1, cstring1,
         |  cfloat,
         |  (-(cdouble)) as c1, (-5638.15 - cdouble) as c2,
         |  (cdouble * -257) as c3, (cint + cfloat) as c4,
         |  ((-(cdouble)) + cbigint) as c5, (-(cdouble)) as c6,
         |  (-1.389 - cfloat) as c7, (-(cfloat)) as c8,
         |  ((-5638.15 - cdouble) + (cint + cfloat)) as c9
         |FROM $T
         |WHERE (((cstring2 IS NOT NULL)
         |  AND ((${ep("ctimestamp1")} <= 10)
         |    AND (${ep("ctimestamp2")} != 16)))
         |  OR ((cfloat < -6432)
         |    OR ((cboolean1 IS NOT NULL) AND (cdouble = 988888))))
         |ORDER BY ctimestamp1, cdouble, cboolean1, cstring1, cfloat,
         |  c1, c2, c3, c4, c5, c6, c7, c8, c9
         |LIMIT 20""".stripMargin),
      ordered = true,
      note = "double negation/arithmetic battery under small-epoch " +
        "timestamp bounds"),

    QCase("vectorization_9.q", "w17s09",
      s"""SELECT cstring1, cdouble, ctimestamp1,
         |  (cdouble - 9763215.5639) AS c1,
         |  (-((cdouble - 9763215.5639))) AS c2, COUNT(cdouble) AS c3,
         |  STDDEV_SAMP(cdouble) AS c4, (-(STDDEV_SAMP(cdouble))) AS c5,
         |  (STDDEV_SAMP(cdouble) * COUNT(cdouble)) AS c6,
         |  MIN(cdouble) AS c7, (9763215.5639 / cdouble) AS c8,
         |  (COUNT(cdouble) / -1.389) AS c9, STDDEV_SAMP(cdouble) AS c10
         |FROM $T
         |WHERE ((cstring2 LIKE '%b%')
         |  AND ((cdouble >= -1.389) OR (cstring1 < 'a')))
         |GROUP BY cstring1, cdouble, ctimestamp1""".stripMargin,
      note = "grouped stddev_samp — singleton groups answer NULL, " +
        "not NaN (both engines agree post-3.1 semantics)"),

    QCase("vectorization_10.q", "w17s10",
      s"""SELECT cdouble, ctimestamp1, ctinyint, cboolean1, cstring1,
         |  (-(cdouble)) AS c1, (cdouble + csmallint) AS c2,
         |  ((cdouble + csmallint) % 33) AS c3, (-(cdouble)) AS c4,
         |  (ctinyint % cdouble) AS c5, (ctinyint % csmallint) AS c6,
         |  (-(cdouble)) AS c7, (cbigint * (ctinyint % csmallint)) AS c8,
         |  (9763215.5639 - (cdouble + csmallint)) AS c9,
         |  (-((-(cdouble)))) AS c10
         |FROM $T
         |WHERE (((cstring2 <= '10')
         |  OR ((ctinyint > cdouble) AND (-5638.15 >= ctinyint)))
         |  OR ((cdouble > 6981)
         |    AND ((csmallint = 9763215.5639) OR (cstring1 LIKE '%a'))))"""
        .stripMargin,
      note = "modulo across int/double mixes; string <= '10' stays a " +
        "STRING comparison (both sides string group)"),

    QCase("vectorization_11.q", "w17s11",
      s"""SELECT cstring1, cboolean1, cdouble, ctimestamp1,
         |  (-3728 * csmallint) AS c1, (cdouble - 9763215.5639) AS c2,
         |  (-(cdouble)) AS c3, ((-(cdouble)) + 6981) AS c4,
         |  (cdouble * -5638.15) AS c5
         |FROM $T
         |WHERE ((cstring2 = cstring1)
         |  OR ((ctimestamp1 IS NULL) AND (cstring1 LIKE '%a')))"""
        .stripMargin,
      duck = Some(s"""SELECT cstring1, cboolean1, cdouble, ctimestamp1,
         |  (-3728 * CAST(csmallint AS INT)) AS c1,
         |  (cdouble - 9763215.5639) AS c2,
         |  (-(cdouble)) AS c3, ((-(cdouble)) + 6981) AS c4,
         |  (cdouble * -5638.15) AS c5
         |FROM $T
         |WHERE ((cstring2 = cstring1)
         |  OR ((ctimestamp1 IS NULL) AND (cstring1 LIKE '%a')))"""
        .stripMargin),
      note = "string-equality OR null-timestamp filter (smallint " +
        "product widened for DuckDB's strict INT16)"),

    QCase("vectorization_12.q", "w17s12",
      s"""SELECT cbigint, cboolean1, cstring1, ctimestamp1, cdouble,
         |  (-6432 * cdouble) AS c1, (-(cbigint)) AS c2,
         |  COUNT(cbigint) AS c3, (cbigint * COUNT(cbigint)) AS c4,
         |  STDDEV_SAMP(cbigint) AS c5,
         |  ((-6432 * cdouble) / -6432) AS c6, AVG(cdouble) AS c7,
         |  (-5638.15 + cbigint) AS c8, SUM(cbigint) AS c9,
         |  (AVG(cdouble) / (-6432 * cdouble)) AS c10,
         |  STDDEV_POP(cdouble) AS c11
         |FROM $T
         |WHERE (((ctimestamp1 IS NULL)
         |  AND ((cboolean1 >= cboolean2) OR (ctinyint != csmallint)))
         |  AND ((cstring1 LIKE '%a')
         |    OR ((cboolean2 <= 1) AND (cbigint >= csmallint))))
         |GROUP BY cbigint, cboolean1, cstring1, ctimestamp1, cdouble
         |ORDER BY ctimestamp1, cdouble, cbigint, cstring1"""
        .stripMargin,
      duck = Some(s"""SELECT cbigint, cboolean1, cstring1, ctimestamp1,
         |  cdouble,
         |  (-6432 * cdouble) AS c1, (-(cbigint)) AS c2,
         |  COUNT(cbigint) AS c3, (cbigint * COUNT(cbigint)) AS c4,
         |  STDDEV_SAMP(cbigint) AS c5,
         |  ((-6432 * cdouble) / -6432) AS c6, AVG(cdouble) AS c7,
         |  (-5638.15 + cbigint) AS c8, SUM(cbigint) AS c9,
         |  (AVG(cdouble) / (-6432 * cdouble)) AS c10,
         |  STDDEV_POP(cdouble) AS c11
         |FROM $T
         |WHERE (((ctimestamp1 IS NULL)
         |  AND ((cboolean1 >= cboolean2) OR (ctinyint != csmallint)))
         |  AND ((cstring1 LIKE '%a')
         |    OR ((CAST(cboolean2 AS INT) <= 1)
         |      AND (cbigint >= csmallint))))
         |GROUP BY cbigint, cboolean1, cstring1, ctimestamp1, cdouble
         |ORDER BY ctimestamp1, cdouble, cbigint, cstring1"""
        .stripMargin),
      note = "bool >= bool is a plain boolean comparison; " +
        "cboolean2 <= 1 goes through the double conversion"),

    QCase("vectorization_13.q", "w17s13",
      s"""SELECT cboolean1, ctinyint, ctimestamp1, cfloat, cstring1,
         |  (-(ctinyint)) as c1, MAX(ctinyint) as c2,
         |  ((-(ctinyint)) + MAX(ctinyint)) as c3, SUM(cfloat) as c4,
         |  (-(SUM(cfloat))) as c6, (79.553 * cfloat) as c7,
         |  STDDEV_POP(cfloat) as c8, STDDEV_POP(ctinyint) as c10,
         |  MAX(cfloat) as c14, MIN(ctinyint) as c16
         |FROM $T
         |WHERE (((cfloat < 3569)
         |  AND ((10.175 >= cdouble) AND (cboolean1 != 1)))
         |  OR ((ctimestamp1 > -28789)
         |    AND ((ctimestamp2 != -28788)
         |      AND (ctinyint < 9763215.5639))))
         |GROUP BY cboolean1, ctinyint, ctimestamp1, cfloat, cstring1
         |ORDER BY cboolean1, ctinyint, ctimestamp1, cfloat, cstring1
         |LIMIT 40""".stripMargin,
      duck = Some(s"""SELECT cboolean1, ctinyint, ctimestamp1, cfloat,
         |  cstring1,
         |  (-(ctinyint)) as c1, MAX(ctinyint) as c2,
         |  ((-(ctinyint)) + MAX(ctinyint)) as c3, SUM(cfloat) as c4,
         |  (-(SUM(cfloat))) as c6, (79.553 * cfloat) as c7,
         |  STDDEV_POP(cfloat) as c8, STDDEV_POP(ctinyint) as c10,
         |  MAX(cfloat) as c14, MIN(ctinyint) as c16
         |FROM $T
         |WHERE (((cfloat < 3569)
         |  AND ((10.175 >= cdouble)
         |    AND (CAST(cboolean1 AS INT) != 1)))
         |  OR ((${ep("ctimestamp1")} > -28789)
         |    AND ((${ep("ctimestamp2")} != -28788)
         |      AND (ctinyint < 9763215.5639))))
         |GROUP BY cboolean1, ctinyint, ctimestamp1, cfloat, cstring1
         |ORDER BY cboolean1, ctinyint, ctimestamp1, cfloat, cstring1
         |LIMIT 40""".stripMargin),
      ordered = true,
      note = "cboolean1 != 1 (boolean-double conversion) AND two " +
        "epoch-seconds timestamp predicates in one filter tree"),

    QCase("vectorization_14.q", "w17s14",
      s"""SELECT ctimestamp1, cfloat, cstring1, cboolean1, cdouble,
         |  (-26.28 + cdouble) AS c1, (-((-26.28 + cdouble))) AS c2,
         |  STDDEV_SAMP((-((-26.28 + cdouble)))) AS c3,
         |  (cfloat * -26.28) AS c4, MAX(cfloat) AS c5,
         |  (-(cfloat)) AS c6, (-(MAX(cfloat))) AS c7,
         |  ((-((-26.28 + cdouble))) / 10.175) AS c8,
         |  STDDEV_POP(cfloat) AS c9, COUNT(cfloat) AS c10,
         |  (cfloat - cdouble) AS c11, VAR_POP(cfloat) AS c12,
         |  VAR_SAMP(cfloat) AS c13
         |FROM $T
         |WHERE (((ctinyint <= cbigint)
         |  AND ((cint <= cdouble) OR (ctimestamp2 < ctimestamp1)))
         |  AND ((cdouble < ctinyint)
         |    AND ((cbigint > -257) OR (cfloat < cint))))
         |GROUP BY ctimestamp1, cfloat, cstring1, cboolean1, cdouble
         |ORDER BY cstring1, cfloat, cdouble, ctimestamp1"""
        .stripMargin,
      note = "stddev_samp of an EXPRESSION per group — singleton " +
        "groups answer NULL in both engines"),

    QCase("vectorization_15.q", "w17s15",
      s"""SELECT cfloat, cboolean1, cdouble, cstring1, ctinyint, cint,
         |  ctimestamp1,
         |  STDDEV_SAMP(cfloat) AS c1, (-26.28 - cint) AS c2,
         |  MIN(cdouble) AS c3, (cdouble * 79.553) AS c4,
         |  (33 % cfloat) AS c5, STDDEV_SAMP(ctinyint) AS c6,
         |  VAR_POP(ctinyint) AS c7, (-23 % cdouble) AS c8,
         |  (-(ctinyint)) AS c9, VAR_SAMP(cint) AS c10,
         |  (cint - cfloat) AS c11, (-23 % ctinyint) AS c12,
         |  (-((-26.28 - cint))) AS c13, STDDEV_POP(cint) AS c14
         |FROM $T
         |WHERE (((cstring2 LIKE '%ss%') OR (cstring1 LIKE '10%'))
         |  OR ((cint >= -75)
         |    AND ((ctinyint = csmallint) AND (cdouble >= -3728))))
         |GROUP BY cfloat, cboolean1, cdouble, cstring1, ctinyint,
         |  cint, ctimestamp1
         |ORDER BY cfloat, cboolean1, cdouble, cstring1, ctinyint,
         |  cint, ctimestamp1""".stripMargin,
      ordered = true,
      note = "float modulo (33 % cfloat, -23 % ctinyint) across a " +
        "wide grouped projection"),

    QCase("vectorization_16.q", "w17s16",
      s"""SELECT cstring1, cdouble, ctimestamp1,
         |  (cdouble - 9763215.5639) AS c1, COUNT(cdouble) AS c2,
         |  STDDEV_SAMP(cdouble) AS c3,
         |  (STDDEV_SAMP(cdouble) * COUNT(cdouble)) AS c4,
         |  MIN(cdouble) AS c5, (9763215.5639 / cdouble) AS c6,
         |  (COUNT(cdouble) / -1.389) AS c7
         |FROM $T
         |WHERE ((cstring2 LIKE '%b%')
         |  AND ((cdouble >= -1.389) OR (cstring1 < 'a')))
         |GROUP BY cstring1, cdouble, ctimestamp1""".stripMargin,
      note = "vectorization_9's shape re-pinned for the PARQUET " +
        "variant file"),

    QCase("vectorization_17.q", "w17s17",
      s"""SELECT cfloat, cstring1, cint, ctimestamp1, cdouble, cbigint,
         |  (cfloat / ctinyint) AS c1, (cint % cbigint) AS c2,
         |  (-(cdouble)) AS c3, (cdouble + (cfloat / ctinyint)) AS c4,
         |  (cdouble / cint) AS c5, (-((-(cdouble)))) AS c6,
         |  (9763215.5639 % cbigint) AS c7,
         |  (2563.58 + (-((-(cdouble))))) AS c8
         |FROM $T
         |WHERE (((cbigint > -23)
         |  AND ((cdouble != 988888) OR (cint > -863.257)))
         |  AND ((ctinyint >= 33)
         |    OR ((csmallint >= cbigint) OR (cfloat = cdouble))))
         |ORDER BY cbigint, cfloat""".stripMargin,
      duck = Some(s"""SELECT cfloat, cstring1, cint, ctimestamp1,
         |  cdouble, cbigint,
         |  (cfloat / ctinyint) AS c1, (cint % cbigint) AS c2,
         |  (-(cdouble)) AS c3, (cdouble + (cfloat / ctinyint)) AS c4,
         |  (cdouble / cint) AS c5, (-((-(cdouble)))) AS c6,
         |  (CAST(9763215.5639 AS DOUBLE) % cbigint) AS c7,
         |  (2563.58 + (-((-(cdouble))))) AS c8
         |FROM $T
         |WHERE (((cbigint > -23)
         |  AND ((cdouble != 988888) OR (cint > -863.257)))
         |  AND ((ctinyint >= 33)
         |    OR ((csmallint >= cbigint) OR (cfloat = cdouble))))
         |ORDER BY cbigint, cfloat""".stripMargin),
      note = "decimal-literal modulo against bigint; ORDER BY is a " +
        "prefix so the sorted comparator takes over (no LIMIT)"),

    QCase("vectorization_div0.q", "w17s18",
      s"""select cint, cint / 0 as cint_div, ctinyint,
         |  ctinyint / 0 as ctinyint_div, cbigint,
         |  cbigint / 0 as cbigint_div, cdouble,
         |  cdouble / 0.0 as cdouble_div
         |from $T order by cint, ctinyint, cbigint, cdouble limit 100"""
        .stripMargin,
      duck = Some(s"""select cint, NULL as cint_div, ctinyint,
         |  NULL as ctinyint_div, cbigint, NULL as cbigint_div,
         |  cdouble, NULL as cdouble_div
         |from $T order by cint NULLS LAST, ctinyint NULLS LAST,
         |  cbigint NULLS LAST, cdouble NULLS LAST limit 100"""
        .stripMargin),
      ordered = true,
      note = "x / 0 answers NULL for every numeric type, never an " +
        "error (Hive non-ANSI division)"),

    QCase("vectorization_div0.q", "w17s19",
      s"""select (cbigint - 988888) as s1,
         |  cdouble / (cbigint - 988888) as s2,
         |  1.2 / (cbigint - 988888) as s3
         |from $T where cbigint > 0 and cbigint < 100000000
         |order by s1, s2, s3 limit 100""".stripMargin,
      duck = Some(s"""select (cbigint - 988888) as s1,
         |  cdouble / (cbigint - 988888) as s2,
         |  1.2 / (cbigint - 988888) as s3
         |from $T where cbigint > 0 and cbigint < 100000000
         |order by s1 NULLS LAST, s2 NULLS LAST, s3 NULLS LAST
         |limit 100""".stripMargin),
      ordered = true,
      note = "the 988888 rows hit a computed zero divisor mid-column " +
        "— those cells NULL, the rest divide")
  )

  test("qtest conformance wave 17s: the vectorization_2-17 battery " +
      "(aggregate arithmetic towers, epoch-seconds timestamp filters, " +
      "boolean-double comparisons, div-by-zero NULLs)") {
    run("vectorization")
  }
}
