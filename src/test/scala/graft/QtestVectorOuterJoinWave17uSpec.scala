package graft

/** Conformance wave 17u: the vector outer-join family (ref ql/src/test/
  * queries/clientpositive/vector_outer_join{0,1,2,3,4}.q,
  * vector_outer_join_constants.q, vector_outer_join_no_keys.q,
  * vector_left_outer_join.q, vector_left_outer_join2.q,
  * vector_left_outer_join3.q, vector_full_outer_join.q,
  * vector_full_outer_join2.q, vector_full_outer_join_date.q). The
  * files pin Hive's vectorized/native outer MapJoin results; the
  * semantics gated here are NULL-key never-matching, ON-clause filters
  * on the PRESERVED side (rows survive with NULL right), outer joins
  * with NO join condition at all, constant-folded dim joins under full
  * outer, and the small-table-union fixture shapes.
  *
  * The tjoin1/tjoin2 fixtures inline their three/four rows; the
  * small_alltypesorc fixtures rebuild as full-width order-by-limit
  * CTEs (deterministic sample).
  */
class QtestVectorOuterJoinWave17uSpec extends QtestHarness {

  private val T = "qt_alltypesorc"

  private val ot1 = """(VALUES ('<null1>', CAST(NULL AS INT)),
    |  ('one', 1), ('one', 1), ('two', 2), ('three', 3),
    |  ('<null2>', CAST(NULL AS INT))) orc_table_1(v1, a)""".stripMargin
  private val ot2 = """(VALUES (0, 'ZERO'), (2, 'TWO'), (3, 'THREE'),
    |  (CAST(NULL AS INT), '<NULL1>'), (4, 'FOUR'),
    |  (CAST(NULL AS INT), '<NULL2>')) orc_table_2(c, v2)""".stripMargin

  private val tj1 = """(VALUES (0, 10, 15), (1, 20, 25),
    |  (2, CAST(NULL AS INT), 50)) tjoin1(rnum, c1, c2)""".stripMargin
  private val tj2 = """(VALUES (0, 10, 'BB'), (1, 15, 'DD'),
    |  (2, CAST(NULL AS INT), 'EE'),
    |  (3, 10, 'FF')) tjoin2(rnum, c1, c2)""".stripMargin

  // the recurring 4-way null-partitioned 5-row sample union
  private def smallA(nullCol: String) =
    s"""small_src as (
       |  select * from (select * from $T
       |    where cint is not null and $nullCol is not null
       |    order by ctinyint, csmallint, cint, cbigint, cfloat,
       |      cdouble, cstring1, cstring2, ctimestamp1, ctimestamp2,
       |      cboolean1, cboolean2 limit 5) sq1
       |  union all
       |  select * from (select * from $T
       |    where cint is null and $nullCol is not null
       |    order by ctinyint, csmallint, cint, cbigint, cfloat,
       |      cdouble, cstring1, cstring2, ctimestamp1, ctimestamp2,
       |      cboolean1, cboolean2 limit 5) sq2
       |  union all
       |  select * from (select * from $T
       |    where cint is not null and $nullCol is null
       |    order by ctinyint, csmallint, cint, cbigint, cfloat,
       |      cdouble, cstring1, cstring2, ctimestamp1, ctimestamp2,
       |      cboolean1, cboolean2 limit 5) sq3
       |  union all
       |  select * from (select * from $T
       |    where cint is null and $nullCol is null
       |    order by ctinyint, csmallint, cint, cbigint, cfloat,
       |      cdouble, cstring1, cstring2, ctimestamp1, ctimestamp2,
       |      cboolean1, cboolean2 limit 5) sq4)""".stripMargin

  protected val qcases: Seq[QCase] = Seq(

    QCase("vector_outer_join0.q", "w17u01",
      s"""select orc_table_1.v1, orc_table_1.a, orc_table_2.c,
         |  orc_table_2.v2 from $ot1
         |left outer join $ot2 on orc_table_1.a = orc_table_2.c""".stripMargin,
      note = "NULL keys on both sides never match; the two <null> " +
        "rows survive with a NULL right side"),

    QCase("vector_outer_join0.q", "w17u02",
      s"""select orc_table_1.v1, orc_table_1.a, orc_table_2.c,
         |  orc_table_2.v2 from $ot1
         |right outer join $ot2 on orc_table_1.a = orc_table_2.c""".stripMargin,
      note = "right outer: ZERO/FOUR/<NULL*> rows survive with NULL " +
        "left"),

    QCase("vector_outer_join1.q", "w17u03",
      s"""with ${smallA("ctinyint")}
         |select count(*) AS cnt, sum(t1.c_ctinyint) AS s from (
         |  select c.ctinyint as c_ctinyint
         |  from small_src c
         |  left outer join small_src cd on cd.cint = c.cint
         |  left outer join small_src hd on hd.ctinyint = c.ctinyint
         |) t1""".stripMargin,
      note = "double self-LOJ over the 4-way null-partitioned sample " +
        "(cint nulls fan out un-matched, tinyint nulls too)"),

    QCase("vector_outer_join2.q", "w17u04",
      s"""with ${smallA("ctinyint")}
         |select count(*) AS cnt, sum(t1.c_cbigint) AS s from (
         |  select c.cbigint as c_cbigint
         |  from small_src c
         |  left outer join small_src cd on cd.cint = c.cint
         |  left outer join small_src hd on hd.cbigint = c.cbigint
         |) t1""".stripMargin,
      note = "same shape keyed on cbigint for the second hop"),

    QCase("vector_outer_join3.q", "w17u05",
      s"""with ${smallA("cstring1")}
         |select count(*) AS cnt from (
         |  select c.cstring1
         |  from small_src c
         |  left outer join small_src cd on cd.cint = c.cint
         |  left outer join small_src hd on hd.cstring1 = c.cstring1
         |) t1""".stripMargin,
      note = "STRING join key on the second hop (null-string " +
        "partitions in the sample)"),

    QCase("vector_outer_join4.q", "w17u06",
      s"""with ${smallA("ctinyint")}
         |select count(*) AS cnt from (
         |  select c.ctinyint
         |  from small_src c
         |  left outer join small_src cd on cd.cint = c.cint
         |  left outer join small_src hd on hd.ctinyint = c.ctinyint
         |) t1""".stripMargin,
      note = "the count-only variant (the file differs from join1 by " +
        "mapjoin conf and projected columns)"),

    QCase("vector_outer_join5.q", "w17u07",
      s"""with sorted_mod_4 as (
         |  select ctinyint, pmod(cint, 4) as cmodint from $T
         |  where cint is not null and ctinyint is not null),
         |small_table as (
         |  select ctinyint, cbigint from $T
         |  order by ctinyint, cbigint, cstring1 limit 100)
         |select count(*) AS cnt from (select s.ctinyint, st.cbigint
         |  from sorted_mod_4 s
         |  left outer join small_table st
         |    on s.ctinyint = st.ctinyint
         |) t1""".stripMargin,
      duck = Some(s"""with sorted_mod_4 as (
         |  select ctinyint, ((cint % 4) + 4) % 4 as cmodint from $T
         |  where cint is not null and ctinyint is not null),
         |small_table as (
         |  select ctinyint, cbigint from $T
         |  order by ctinyint, cbigint, cstring1 limit 100)
         |select count(*) AS cnt from (select s.ctinyint, st.cbigint
         |  from sorted_mod_4 s
         |  left outer join small_table st
         |    on s.ctinyint = st.ctinyint
         |) t1""".stripMargin),
      note = "mod-projected fact LOJ a deterministic 100-row dim " +
        "(the file's bare LIMIT gets an ORDER BY; pmod respelled " +
        "as the positive-mod formula for DuckDB)"),

    QCase("vector_outer_join_no_keys.q", "w17u08",
      """select count(*) AS c from
        |  (select 1 as y where 1 = 0) bar
        |right outer join (select x from (VALUES (1), (2)) t(x)) foo"""
        .stripMargin,
      duck = Some("""select count(*) AS c from
        |  (select 1 as y where 1 = 0) bar
        |right outer join (select x from (VALUES (1), (2)) t(x)) foo
        |on true""".stripMargin),
      note = "RIGHT OUTER with NO join condition over an empty " +
        "preserved-null side = 2 rows (Hive parses the conditionless " +
        "outer join as ON TRUE)"),

    QCase("vector_outer_join_no_keys.q", "w17u09",
      """select count(*) AS c from
        |  (select 1 as y where 1 = 0) bar,
        |  (select x from (VALUES (1), (2)) t(x)) foo""".stripMargin,
      note = "the plain cartesian twin is 0 rows"),

    QCase("vector_left_outer_join.q", "w17u10",
      s"""select count(*) AS c from (select c.ctinyint
         |from $T c
         |left outer join $T cd on cd.cint = c.cint
         |left outer join $T hd on hd.ctinyint = c.ctinyint
         |) t1""".stripMargin,
      note = "full-size double self-LOJ row count (the fan-out " +
        "multiplies per-key duplicates)"),

    QCase("vector_left_outer_join2.q", "w17u11",
      s"""select tjoin1.rnum, tjoin1.c1, tjoin1.c2, tjoin2.c2 as c2j2
         |from $tj1
         |left outer join $tj2
         |  on ( tjoin1.c1 = tjoin2.c1 and tjoin1.c2 > 15 )""".stripMargin,
      note = "ON-clause filter on the PRESERVED side: rnum 0 keeps " +
        "its row with a NULL right (c2=15 fails the filter)"),

    QCase("vector_left_outer_join3.q", "w17u12",
      s"""select tjoin1.rnum, tjoin1.c1, tjoin1.c2, tjoin2.c2 as c2j2
         |from $tj1
         |left outer join $tj2
         |  on ( tjoin1.c1 = tjoin2.c1 and tjoin2.c2 = 'DD' )""".stripMargin,
      note = "ON-clause filter on the NULL-SUPPLYING side"),

    QCase("vector_full_outer_join.q", "w17u13",
      s"""select tjoin1.rnum, tjoin1.c1, tjoin1.c2,
         |  tjoin2.c1 as c1j2, tjoin2.c2 as c2j2
         |from $tj1
         |full outer join $tj2 on ( tjoin1.c1 = tjoin2.c1 )"""
        .stripMargin,
      note = "full outer over NULL keys: both NULL-keyed rows appear " +
        "unmatched, rnum 3 (c1=10) matches tjoin1's 10"),

    QCase("vector_full_outer_join2.q", "w17u14",
      s"""select tjoin1.rnum, tjoin1.c1, tjoin1.c2,
         |  tjoin2.c1 as c1j2, tjoin2.c2 as c2j2
         |from $tj1
         |full outer join $tj2
         |  on ( tjoin1.c1 = tjoin2.c1 and tjoin1.c2 > 15
         |       and tjoin2.c2 <> 'BB' )""".stripMargin,
      note = "full outer with filters on BOTH sides in the ON clause"),

    QCase("vector_full_outer_join_date.q", "w17u15",
      """select * from
        |  (VALUES (1, date '2023-01-01'), (2, date '2023-01-02'),
        |   (3, date '2023-01-03')) tbl1(id, event_date)
        |full outer join
        |  (VALUES (2, date '2023-01-02'), (3, date '2023-01-04'),
        |   (4, date '2023-01-05')) tbl2(id, event_date)
        |on tbl1.event_date = tbl2.event_date
        |order by tbl1.id, tbl2.id""".stripMargin,
      ordered = true,
      note = "DATE-keyed full outer (the file guards the vectorized " +
        "date hash); NULL ids order per Hive NULLS LAST"),

    QCase("vector_outer_join_constants.q", "w17u16",
      """with item as (select * from (VALUES (101, 22, 'Item 101'),
        |    (102, 22, 'Item 102')) t(ID, S_ID, NAME)),
        |  odetail as (select * from (VALUES
        |    (101, timestamp '2001-06-30 00:00:00'),
        |    (102, timestamp '2002-06-30 00:00:00')) t(ID, O_DATE)),
        |  ytday as (select * from (VALUES
        |    (timestamp '2008-04-30 00:00:00',
        |     timestamp '2001-06-30 00:00:00'),
        |    (timestamp '2008-04-30 00:00:00',
        |     timestamp '2022-06-30 00:00:00')) t(D_DATE, YTD_DATE)),
        |  lday as (select * from (VALUES
        |    (timestamp '2021-06-30 00:00:00',
        |     timestamp '2001-06-30 00:00:00'),
        |    (timestamp '2022-06-30 00:00:00',
        |     timestamp '2002-06-30 00:00:00')) t(D_DATE, LY_DATE))
        |select * from
        |(select item1.S_ID AS S_ID, ytday1.D_DATE AS D_DATE
        |   from odetail od1
        |   join ytday ytday1 on (od1.O_DATE = ytday1.YTD_DATE)
        |   join item item1 on (od1.ID = item1.ID)
        |   where (item1.S_ID in (22)
        |     and ytday1.D_DATE = '2008-04-30 00:00:00')
        |   group by item1.S_ID, ytday1.D_DATE) pa11
        |full outer join
        |(select item2.S_ID AS S_ID, ytday2.D_DATE AS D_DATE
        |   from odetail od2
        |   join lday lday2 on (od2.O_DATE = lday2.LY_DATE)
        |   join ytday ytday2 on (lday2.D_DATE = ytday2.YTD_DATE)
        |   join item item2 on (od2.ID = item2.ID)
        |   where (item2.S_ID in (22)
        |     and ytday2.D_DATE = '2008-04-30 00:00:00')
        |   group by item2.S_ID, ytday2.D_DATE) pa12
        |on (pa11.D_DATE = pa12.D_DATE and pa11.S_ID = pa12.S_ID)"""
        .stripMargin,
      note = "full outer of two constant-keyed aggregated dim chains " +
        "(timestamp = string literal comparison inside); HIVE-25299 " +
        "shape")
  )

  test("qtest conformance wave 17u: the vector outer-join family — " +
      "NULL keys, ON-clause filters each side, conditionless outer " +
      "joins, date/timestamp keys, constant dim chains") {
    run("vector_")
  }
}
