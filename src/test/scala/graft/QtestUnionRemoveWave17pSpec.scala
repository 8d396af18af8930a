package graft

/** Conformance wave 17p: the union_remove_* battery (ref ql/src/test/
  * queries/clientpositive/union_remove_{1..25,6_subq}.q). Every file in
  * the family loads T1.txt and INSERT-OVERWRITEs a union of
  * aggregate / constant-projection / join legs, varying only Hive's
  * union-remove + merge-file + storage-format knobs (mapred.mode,
  * hive.optimize.union.remove, rcfile/textfile sinks) — pure
  * execution-engine plumbing with no Spark analog. What IS semantic,
  * and gated here per file, is each file's distinct union shape: the
  * results must be identical whether or not the union operator is
  * optimized away (that is the optimization's contract).
  *
  * All cases run over the qt_t1 fixture (T1.txt: key,val string pairs)
  * with DuckDB twins of the same text (`values` respelled `vals` —
  * the backquoted reserved word exercises the Hive side only).
  */
class QtestUnionRemoveWave17pSpec extends QtestHarness {

  // the family's recurring legs, verbatim from the files (inputTbl1 ->
  // qt_t1); spark side keeps the backquoted `values` alias
  private def agg(a: String) =
    s"SELECT key, count(1) as `$a` from qt_t1 group by key"
  private def const(n: Int, a: String) =
    s"SELECT key, $n as `$a` from qt_t1"
  private def joinCast(a: String) =
    "select a.key as key, cast(b.val as bigint) as " +
      s"`$a` FROM qt_t1 a join qt_t1 b on a.key=b.key"

  private def dk(sql: String): Option[String] =
    Some(sql.replace("`values`", "vals"))

  private val V = "values"

  protected val qcases: Seq[QCase] = {
    val aggUnionAgg =
      s"SELECT * FROM (\n  ${agg(V)}\n  UNION ALL\n  ${agg(V)}\n) a"
    val aggUnionConsts = s"SELECT * FROM (\n  ${agg(V)}\n  UNION ALL\n" +
      s"  ${const(1, V)}\n  UNION ALL\n  ${const(2, V)}\n) a"
    Seq(
      // agg ∪ agg — the canonical shape (1: textfile sink; 4: map-only
      // merge; 7: merge on; 25: partitioned sink variant)
      QCase("union_remove_1.q", "w17p01", aggUnionAgg,
        duck = dk(aggUnionAgg),
        note = "count-per-key legs unioned ALL: every key twice"),
      QCase("union_remove_4.q", "w17p02", aggUnionAgg,
        duck = dk(aggUnionAgg),
        note = "same shape under map-only merge confs"),
      QCase("union_remove_7.q", "w17p03", aggUnionAgg,
        duck = dk(aggUnionAgg),
        note = "same shape with hive.merge on"),
      QCase("union_remove_25.q", "w17p04", aggUnionAgg,
        duck = dk(aggUnionAgg),
        note = "same shape into a partitioned sink"),

      // agg ∪ const ∪ const (2: textfile; 5: merge; 8: no-merge)
      QCase("union_remove_2.q", "w17p05", aggUnionConsts,
        duck = dk(aggUnionConsts),
        note = "aggregate leg plus two map-only constant legs"),
      QCase("union_remove_5.q", "w17p06", aggUnionConsts,
        duck = dk(aggUnionConsts),
        note = "same shape with merge confs"),
      QCase("union_remove_8.q", "w17p07", aggUnionConsts,
        duck = dk(aggUnionConsts),
        note = "same shape, no merge"),

      // const ∪ const ∪ const
      QCase("union_remove_3.q", "w17p08",
        s"SELECT * FROM (\n  ${const(1, V)}\n  UNION ALL\n" +
          s"  ${const(2, V)}\n  UNION ALL\n  ${const(3, V)}\n) a",
        duck = dk(s"SELECT * FROM (\n  ${const(1, V)}\n  UNION ALL\n" +
          s"  ${const(2, V)}\n  UNION ALL\n  ${const(3, V)}\n) a"),
        note = "all legs map-only constant projections"),

      // nested unions (9/10/11), subquery wrapper (6_subq)
      QCase("union_remove_6_subq.q", "w17p09",
        s"SELECT * FROM (\n  select * from(\n  ${agg(V)}\n" +
          s"  UNION ALL\n  ${agg(V)}\n  )subq\n) a",
        duck = dk(s"SELECT * FROM (\n  select * from(\n  ${agg(V)}\n" +
          s"  UNION ALL\n  ${agg(V)}\n  )subq\n) a"),
        note = "union behind a subquery wrapper, multi-inserted in " +
          "the file"),
      QCase("union_remove_9.q", "w17p10",
        s"SELECT * FROM\n(\n${agg(V)}\nunion all\nselect * FROM (\n" +
          s"  ${const(1, V)}\n  UNION ALL\n  ${const(2, V)}\n) subq\n) a",
        duck = dk(s"SELECT * FROM\n(\n${agg(V)}\nunion all\n" +
          s"select * FROM (\n  ${const(1, V)}\n  UNION ALL\n" +
          s"  ${const(2, V)}\n) subq\n) a"),
        note = "aggregate leg unioned with a nested constant union"),
      QCase("union_remove_10.q", "w17p11",
        s"SELECT * FROM\n(\n${const(1, V)}\nunion all\n" +
          s"select * FROM (\n  ${agg(V)}\n  UNION ALL\n" +
          s"  ${const(2, V)}\n) subq\n) a",
        duck = dk(s"SELECT * FROM\n(\n${const(1, V)}\nunion all\n" +
          s"select * FROM (\n  ${agg(V)}\n  UNION ALL\n" +
          s"  ${const(2, V)}\n) subq\n) a"),
        note = "constant leg outside, aggregate inside the nesting"),
      QCase("union_remove_11.q", "w17p12",
        s"SELECT * FROM\n(\n${const(1, V)}\nunion all\n" +
          "select * FROM (\n  SELECT key, 2 `values` from qt_t1\n" +
          s"  UNION ALL\n  ${const(3, V)}\n) subq\n) a",
        duck = dk(s"SELECT * FROM\n(\n${const(1, V)}\nunion all\n" +
          "select * FROM (\n  SELECT key, 2 vals from qt_t1\n" +
          s"  UNION ALL\n  ${const(3, V)}\n) subq\n) a"),
        note = "bare (AS-less) backquoted alias on the inner leg"),

      // join-bearing legs (12/13/14)
      QCase("union_remove_12.q", "w17p13",
        s"SELECT * FROM\n(\n${const(1, V)}\nunion all\n" +
          s"${joinCast(V)}\n)c",
        duck = dk(s"SELECT * FROM\n(\n${const(1, V)}\nunion all\n" +
          s"${joinCast(V)}\n)c"),
        note = "constant leg unioned with a self-join leg casting " +
          "val to bigint (mapjoin conversion in the file)"),
      QCase("union_remove_13.q", "w17p14",
        s"SELECT * FROM\n(\n${agg(V)}\nunion all\n${joinCast(V)}\n)c",
        duck = dk(s"SELECT * FROM\n(\n${agg(V)}\nunion all\n" +
          s"${joinCast(V)}\n)c"),
        note = "aggregate leg unioned with the self-join leg"),
      QCase("union_remove_14.q", "w17p15",
        s"SELECT * FROM\n(\n${const(1, V)}\nunion all\n" +
          s"${joinCast(V)}\n)c",
        duck = dk(s"SELECT * FROM\n(\n${const(1, V)}\nunion all\n" +
          s"${joinCast(V)}\n)c"),
        note = "union_remove_12's shape under the file's mapjoin confs"),

      // dynamic-partition variants (15/16/17/18): the ds column rides
      // in the select list
      QCase("union_remove_15.q", "w17p16",
        "SELECT * FROM (\n  SELECT key, count(1) as `values`, '1' as " +
          "ds from qt_t1 group by key\n  UNION ALL\n  SELECT key, " +
          "count(1) as `values`, '2' as ds from qt_t1 group by key\n) a",
        duck = dk("SELECT * FROM (\n  SELECT key, count(1) as " +
          "`values`, '1' as ds from qt_t1 group by key\n  UNION ALL\n" +
          "  SELECT key, count(1) as `values`, '2' as ds from qt_t1 " +
          "group by key\n) a"),
        note = "aggregate legs carrying distinct dynamic-partition " +
          "constants"),
      QCase("union_remove_16.q", "w17p17",
        "SELECT * FROM (\n  SELECT key, count(1) as `values`, '1' as " +
          "ds from qt_t1 group by key\n  UNION ALL\n  SELECT key, " +
          "count(1) as `values`, '2' as ds from qt_t1 group by key\n) a",
        duck = dk("SELECT * FROM (\n  SELECT key, count(1) as " +
          "`values`, '1' as ds from qt_t1 group by key\n  UNION ALL\n" +
          "  SELECT key, count(1) as `values`, '2' as ds from qt_t1 " +
          "group by key\n) a"),
        note = "same with merge confs"),
      QCase("union_remove_17.q", "w17p18",
        "SELECT * FROM (\n  SELECT key, 1 as `values`, '1' as ds " +
          "from qt_t1\n  UNION ALL\n  SELECT key, 2 as `values`, " +
          "'2' as ds from qt_t1\n) a",
        duck = dk("SELECT * FROM (\n  SELECT key, 1 as `values`, " +
          "'1' as ds from qt_t1\n  UNION ALL\n  SELECT key, 2 as " +
          "`values`, '2' as ds from qt_t1\n) a"),
        note = "map-only constant legs with partition constants"),
      QCase("union_remove_18.q", "w17p19",
        "SELECT * FROM (\n  SELECT key, count(1) as `values`, val as " +
          "ds from qt_t1 group by key, val\n  UNION ALL\n  SELECT " +
          "key, count(1) as `values`, val as ds from qt_t1 group by " +
          "key, val\n) a",
        duck = dk("SELECT * FROM (\n  SELECT key, count(1) as " +
          "`values`, val as ds from qt_t1 group by key, val\n  UNION " +
          "ALL\n  SELECT key, count(1) as `values`, val as ds from " +
          "qt_t1 group by key, val\n) a"),
        note = "true dynamic partitioning: ds comes from the data " +
          "(group by key, val)"),

      // projected outer selects (19/20/21/22)
      QCase("union_remove_19.q", "w17p20",
        s"SELECT a.key, a.`values`\nFROM (\n  ${agg(V)}\n  UNION " +
          s"ALL\n  ${agg(V)}\n) a",
        duck = dk(s"SELECT a.key, a.`values`\nFROM (\n  ${agg(V)}\n" +
          s"  UNION ALL\n  ${agg(V)}\n) a"),
        note = "explicit column projection above the union (the file " +
          "also runs a filtered and an arithmetic variant)"),
      QCase("union_remove_19.q", "w17p21",
        s"SELECT a.key, a.`values`\nFROM (\n  ${agg(V)}\n  UNION " +
          s"ALL\n  ${agg(V)}\n) a\nwhere a.key = 7",
        duck = Some((s"SELECT a.key, a.vals\nFROM (\n  ${agg("x")}\n" +
          s"  UNION ALL\n  ${agg("x")}\n) a\nwhere a.key = 7")
          .replace("`x`", "vals")),
        note = "filter above the union (numeric-coerced key = 7)"),
      QCase("union_remove_20.q", "w17p22",
        s"SELECT a.`values`, a.key\nFROM (\n  ${agg(V)}\n  UNION " +
          s"ALL\n  ${agg(V)}\n) a",
        duck = dk(s"SELECT a.`values`, a.key\nFROM (\n  ${agg(V)}\n" +
          s"  UNION ALL\n  ${agg(V)}\n) a"),
        note = "column-swapped projection above the union"),
      QCase("union_remove_21.q", "w17p23",
        s"SELECT a.key\nFROM (\n  ${agg(V)}\n  UNION ALL\n" +
          s"  ${agg(V)}\n) a",
        duck = dk(s"SELECT a.key\nFROM (\n  ${agg(V)}\n  UNION " +
          s"ALL\n  ${agg(V)}\n) a"),
        note = "pruning projection: only the key survives the union"),
      QCase("union_remove_22.q", "w17p24",
        s"SELECT a.key, a.`values`, a.`values`\nFROM (\n  ${agg(V)}\n" +
          s"  UNION ALL\n  ${agg(V)}\n) a",
        duck = dk(s"SELECT a.key, a.`values`, a.`values`\nFROM (\n" +
          s"  ${agg(V)}\n  UNION ALL\n  ${agg(V)}\n) a"),
        note = "duplicated column above the union (the file also " +
          "runs a sum(values)+sum(values) variant)"),

      // join-under-aggregate leg (23), heterogenous key types (24)
      QCase("union_remove_23.q", "w17p25",
        "SELECT * FROM (\n  SELECT key, count(1) as `values` from\n" +
          "  (SELECT a.key, b.val from qt_t1 a join qt_t1 b on " +
          s"a.key=b.key) subq group by key\n  UNION ALL\n  ${agg(V)}\n" +
          ") subq2",
        duck = dk("SELECT * FROM (\n  SELECT key, count(1) as " +
          "`values` from\n  (SELECT a.key, b.val from qt_t1 a join " +
          "qt_t1 b on a.key=b.key) subq group by key\n  UNION ALL\n" +
          s"  ${agg(V)}\n) subq2"),
        note = "aggregate over a self-join unioned with the plain " +
          "aggregate"),
      QCase("union_remove_24.q", "w17p26",
        "SELECT * FROM\n(\n  SELECT CAST(key AS DOUBLE) AS key, " +
          "count(1) as `values` FROM qt_t1 group by key\n  UNION ALL\n" +
          "  SELECT CAST(key AS BIGINT) AS key, count(1) as `values` " +
          "FROM qt_t1 group by key\n) a",
        duck = dk("SELECT * FROM\n(\n  SELECT CAST(key AS DOUBLE) AS " +
          "key, count(1) as `values` FROM qt_t1 group by key\n  UNION " +
          "ALL\n  SELECT CAST(key AS BIGINT) AS key, count(1) as " +
          "`values` FROM qt_t1 group by key\n) a"),
        note = "DOUBLE and BIGINT key legs unify to DOUBLE across " +
          "the union")
    )
  }

  test("qtest conformance: union_remove_* battery — every file's " +
      "union shape answers identically with and without the " +
      "union-remove optimization (the knobs themselves are Hive " +
      "execution plumbing)") {
    run("union_remove_")
  }
}
