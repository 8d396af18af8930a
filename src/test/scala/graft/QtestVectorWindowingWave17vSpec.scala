package graft

/** Conformance wave 17v: the vector_windowing_* family (ref
  * ql/src/test/queries/clientpositive/vector_windowing.q, _gby.q,
  * _gby2.q, _multipartitioning.q, _navfn.q, _order_null.q,
  * _range_multiorder.q, _rank.q, _row_number.q, _streaming.q,
  * _windowspec.q, _windowspec4.q). The files pin Hive's vectorized PTF
  * path over the over10k/part/cbo_t3 fixtures.
  *
  * Determinism discipline for the porting: the files' bare
  * `limit 100`s are dropped (full-set sorted compare) and only
  * TIE-STABLE window shapes are pinned directly — rank/dense_rank/
  * cume_dist (peers share the value), RANGE frames (peers share the
  * frame), and ROWS running sums whose SUMMED column is itself a sort
  * key (tied rows contribute equal values, so the output MULTISET is
  * order-independent). Tie-sensitive row_number/lead get derived
  * deterministic forms (per-partition sums of row numbers, counts of
  * NULL leads) that still exercise the same machinery.
  */
class QtestVectorWindowingWave17vSpec extends QtestHarness {

  private val O = "qt_over10k"

  protected val qcases: Seq[QCase] = Seq(

    QCase("vector_windowing.q", "w17v01",
      """select p_mfgr, p_name, p_size,
        |rank() over(partition by p_mfgr order by p_name) as r,
        |dense_rank() over(partition by p_mfgr order by p_name) as dr,
        |round(sum(p_retailprice) over (partition by p_mfgr
        |  order by p_name rows between unbounded preceding
        |  and current row), 2) as s1
        |from qt_part""".stripMargin,
      duck = Some("""select p_mfgr, p_name, p_size,
        |rank() over(partition by p_mfgr order by p_name) as r,
        |dense_rank() over(partition by p_mfgr order by p_name) as dr,
        |round(sum(p_retailprice) over (partition by p_mfgr
        |  order by p_name rows between unbounded preceding
        |  and current row), 2) as s1
        |from qt_part""".stripMargin),
      note = "the canonical part-table windowing battery (the file " +
        "spells it DISTRIBUTE BY/SORT BY; p_name unique per mfgr " +
        "keeps the running sum deterministic)"),

    QCase("vector_windowing_gby.q", "w17v02",
      """select rank() over (order by return_ratio) as return_rank from
        |(select sum(wr.cint) / sum(ws.c_int) as return_ratio
        |   from qt_cbot3 ws join qt_alltypesorc wr
        |     on ws.value = wr.cstring1
        |   group by ws.c_boolean) in_web""".stripMargin,
      note = "rank above an aggregate-of-join subquery"),

    QCase("vector_windowing_gby2.q", "w17v03",
      "select rank() over (order by sum(ws.c_int)) as return_rank " +
        "from qt_cbot3 ws group by ws.key",
      note = "window directly over the grouped aggregate"),

    QCase("vector_windowing_gby2.q", "w17v04",
      """select avg(cast(ws.key as int)) over (
        |  partition by min(ws.value) order by sum(ws.c_int))
        |  as return_rank
        |from qt_cbot3 ws group by ws.key""".stripMargin,
      duck = Some("""select avg(cast(ws.key as int)) over (
        |  partition by min(ws.value) order by sum(ws.c_int))
        |  as return_rank
        |from qt_cbot3 ws
        |group by ws.key""".stripMargin),
      note = "window whose PARTITION and ORDER keys are themselves " +
        "aggregates (cast of non-numeric keys NULLs)"),

    QCase("vector_windowing_multipartitioning.q", "w17v05",
      s"""select s, rank() over (partition by s order by si) AS r,
         |  sum(b) over (partition by s order by si) AS sb
         |from $O""".stripMargin,
      note = "rank + RANGE-default running sum sharing one partition " +
        "spec (peers share both values)"),

    QCase("vector_windowing_multipartitioning.q", "w17v06",
      s"""select s, sum(i) over (partition by s) AS si_,
         |  sum(f) over (partition by si) AS sf
         |from $O where s = 'tom allen' or s = 'bob steinbeck'"""
        .stripMargin,
      note = "two different partition specs in one select, orderless " +
        "frames"),

    QCase("vector_windowing_navfn.q", "w17v07",
      "select row_number() over () AS r from qt_src where key = '238'",
      note = "row_number over the whole 2-row selection: {1, 2}"),

    QCase("vector_windowing_navfn.q", "w17v08",
      s"""select d, sum(rn) AS s, count(*) AS c from (
         |  select d, row_number() over (partition by d
         |    order by `dec`) as rn from $O) t
         |group by d""".stripMargin,
      duck = Some(s"""select d, sum(rn) AS s, count(*) AS c from (
         |  select d, row_number() over (partition by d
         |    order by "dec") as rn from $O) t
         |group by d""".stripMargin),
      note = "per-partition row_number sums are 1..n regardless of " +
        "tie order — pins the partition/order machinery " +
        "deterministically"),

    QCase("vector_windowing_navfn.q", "w17v09",
      s"""select count(*) AS tails from (
         |  select lead(s) over (partition by t order by d, i desc)
         |    as l from $O) t
         |where l is null""".stripMargin,
      note = "lead() past each partition's tail answers NULL — the " +
        "NULL count equals the partition count (the file partitions " +
        "by the binary column, absent from the parquet fixture; " +
        "tinyint stands in; NULL s values also lead to NULL only at " +
        "tails since lead defaults NULL)"),

    QCase("vector_windowing_order_null.q", "w17v10",
      s"""select i, s, b, sum(b) over (partition by i
         |  order by s nulls last, b rows unbounded preceding) AS sb
         |from $O""".stripMargin,
      duck = Some(s"""select i, s, b, sum(b) over (partition by i
         |  order by s nulls last, b rows unbounded preceding) AS sb
         |from $O""".stripMargin),
      note = "explicit NULLS LAST window sort; the summed column is " +
        "a sort key so the running-sum multiset is tie-stable"),

    QCase("vector_windowing_order_null.q", "w17v11",
      s"""select d, s, f, sum(f) over (partition by d
         |  order by s, f desc nulls first rows unbounded preceding)
         |  AS sf
         |from $O""".stripMargin,
      note = "DESC NULLS FIRST inside the window spec"),

    QCase("vector_windowing_order_null.q", "w17v12",
      s"""select ts, s, f, sum(f) over (partition by ts
         |  order by f asc nulls first
         |  range between current row and unbounded following) AS sf
         |from $O""".stripMargin,
      note = "forward-only RANGE frame with NULLS FIRST (tie-safe: " +
        "peers share the frame)"),

    QCase("vector_windowing_range_multiorder.q", "w17v13",
      s"""select si, bo, last_value(i) over (partition by si, bo
         |  order by i, f desc range current row) AS lv
         |from $O""".stripMargin,
      note = "RANGE CURRENT ROW frame: last_value of a column that " +
        "IS the leading sort key — peers share i, so lv = i"),

    QCase("vector_windowing_range_multiorder.q", "w17v14",
      s"""select si, bo, rn from (
         |  select si, bo, row_number() over (partition by si, bo
         |    order by i, f desc range between unbounded preceding
         |    and unbounded following) as rn from $O) t""".stripMargin,
      note = "row_number ignores the RANGE frame; per-(si,bo) the rn " +
        "multiset is 1..n regardless of ties"),

    QCase("vector_windowing_rank.q", "w17v15",
      s"select s, rank() over (partition by f order by t) AS r from $O",
      note = "rank keyed off a FLOAT partition column"),

    QCase("vector_windowing_rank.q", "w17v16",
      s"""select s, dense_rank() over (partition by ts
         |  order by i, s desc) AS dr from $O""".stripMargin,
      note = "dense_rank over a composite order including the " +
        "projected column"),

    QCase("vector_windowing_rank.q", "w17v17",
      s"""select s, cume_dist() over (partition by bo
         |  order by b, s) AS cd from $O""".stripMargin,
      note = "cume_dist counts peers inclusively — tie-stable by " +
        "definition"),

    QCase("vector_windowing_row_number.q", "w17v18",
      """with row_number_test as (
        |  select pos, col from (select posexplode(
        |    split(repeat('w,', 5), ',')) as (pos, col)) t
        |  union all
        |  select pos, col from (select posexplode(
        |    split(repeat('x,', 3), ',')) as (pos, col)) t
        |)
        |select col, sum(rn) AS s, count(*) AS c from (
        |  select col, row_number() over (partition by col) as rn
        |  from row_number_test) t
        |group by col""".stripMargin,
      duck = Some("""with row_number_test as (
        |  select * from (VALUES ('w'), ('w'), ('w'), ('w'), ('w'),
        |    (''), ('x'), ('x'), ('x'), ('')) t(col)
        |)
        |select col, sum(rn) AS s, count(*) AS c from (
        |  select col, row_number() over (partition by col) as rn
        |  from row_number_test) t
        |group by col""".stripMargin),
      note = "orderless per-partition row_number sums to n(n+1)/2 " +
        "(posexplode of split keeps the trailing empty token)"),

    QCase("vector_windowing_streaming.q", "w17v19",
      """select * from (select p_mfgr,
        |  rank() over(partition by p_mfgr order by p_name) r
        |  from qt_part) a
        |where r < 4""".stripMargin,
      note = "rank filter above the window (Hive streams the PTF " +
        "with the limit pushed; results gate)"),

    QCase("vector_windowing_streaming.q", "w17v20",
      s"""select * from (select t, avg(d) over (partition by t) avgd
         |  from $O) a
         |where avgd > 0""".stripMargin,
      note = "filter above an orderless windowed average"),

    QCase("vector_windowing_windowspec.q", "w17v21",
      s"""select s, b, sum(b) over (partition by i
         |  order by s, b rows unbounded preceding) AS sb from $O"""
        .stripMargin,
      note = "ROWS running sum whose summed column closes the sort " +
        "key list"),

    QCase("vector_windowing_windowspec.q", "w17v22",
      s"""select s, f, sum(f) over (partition by ts order by f
         |  range between current row and unbounded following) AS sf
         |from $O""".stripMargin,
      note = "forward-only RANGE sum"),

    QCase("vector_windowing_windowspec4.q", "w17v23",
      """select type, i,
        |max(i) over (partition by type order by i
        |  rows between 1 preceding and 7 following) AS mx,
        |min(i) over (partition by type order by i
        |  rows between 1 preceding and 7 following) AS mn,
        |first_value(i) over (partition by type order by i
        |  rows between 1 preceding and 7 following) AS fv,
        |last_value(i) over (partition by type order by i
        |  rows between 1 preceding and 7 following) AS lv,
        |avg(i) over (partition by type order by i
        |  rows between 1 preceding and 7 following) AS av,
        |sum(i) over (partition by type order by i
        |  rows between 1 preceding and 7 following) AS sm,
        |count(i) over (partition by type order by i
        |  rows between 1 preceding and 7 following) AS cn
        |from (VALUES (3, 'a'), (1, 'a'), (2, 'a'))
        |  smalltable_windowing_n0(i, type)""".stripMargin,
      note = "asymmetric 1-preceding/7-following ROWS frame over a " +
        "3-row partition (the frame clips at both edges); the file " +
        "also runs collect_set in the same list, covered by f12's " +
        "oracle")
  )

  test("qtest conformance wave 17v: the vector_windowing family — " +
      "PTF batteries over over10k/part/cbo_t3 with tie-stable " +
      "pinning discipline") {
    run("vector_windowing")
  }
}
