package graft.plans

/** Hive's `FROM UNIQUEJOIN [PRESERVE] t1 a (keys...), ... SELECT ...`
  * verb (ref ql/parse/HiveParser uniqueJoinSource + JoinCond type
  * UNIQUE; uniquejoin.q) — a multi-way co-group on a key-expression
  * tuple:
  *
  *   - every table's rows matching a key group cross-product into the
  *     output (a key with 2 rows in t1 and 2 in t2 emits 4);
  *   - absent tables contribute NULL columns;
  *   - a key group is emitted iff it appears in at least one PRESERVE
  *     table — or, when NO table is marked PRESERVE, iff it appears in
  *     EVERY table (derived from uniquejoin.q.out: all-PRESERVE is the
  *     full outer co-group, no-PRESERVE keeps only key 2, and
  *     mixed-PRESERVE drops exactly the keys present only in the
  *     unpreserved table).
  *
  * Spark has no such verb; the front door lowers it to a key-set
  * driver joined null-safely against each table:
  *
  * {{{
  *   SELECT <sel> FROM (<key set>) __ujk
  *   LEFT JOIN t1 a ON __ujk.__uk0 <=> (a.k) [AND ...] ...
  * }}}
  *
  * where the key set is SELECT DISTINCT over a UNION ALL of the
  * PRESERVE tables' key tuples (or an INTERSECT across all tables when
  * none is preserved — INTERSECT's set semantics match the NULL-safe
  * grouping). At scale each leg is one shuffle on the key, the same
  * network cost as the reference's single co-group stage.
  */
object UniqueJoin {

  private case class Item(preserve: Boolean, table: String, alias: String,
      keys: Seq[String])

  private val Head = """(?is)^\s*FROM\s+UNIQUEJOIN\b(.*)$""".r

  def rewrite(sql: String): Option[String] = sql match {
    case Head(rest) => parse(rest).map { case (items, sel) =>
      require(items.map(_.keys.size).distinct.size == 1,
        "UNIQUEJOIN key lists must have equal arity")
      val n = items.head.keys.size
      def tuple(i: Item): String = i.keys.zipWithIndex
        .map { case (e, j) => s"($e) AS __uk$j" }.mkString(", ")
      val preserved = items.filter(_.preserve)
      val keySet =
        if (preserved.nonEmpty)
          "SELECT DISTINCT " + (0 until n).map(j => s"__uk$j")
            .mkString(", ") + " FROM (" +
            preserved.map(i =>
              s"SELECT ${tuple(i)} FROM ${i.table} ${i.alias}")
              .mkString(" UNION ALL ") + ") __uj_u"
        else {
          // no PRESERVE: first table's keys that exist in EVERY other
          // table. EXISTS comparisons (not INTERSECT) so mixed-type key
          // expressions coerce pairwise like Hive's join comparator —
          // set-op widening would stringify a string-vs-double key list
          // and '2' never matches '2.0'
          val first = items.head
          val probes = items.tail.map { i =>
            val cond = i.keys.zip(first.keys)
              .map { case (e, f) => s"($e) <=> ($f)" }.mkString(" AND ")
            s"EXISTS (SELECT 1 FROM ${i.table} ${i.alias} WHERE $cond)"
          }
          s"SELECT DISTINCT ${tuple(first)} FROM ${first.table} " +
            s"${first.alias} WHERE ${probes.mkString(" AND ")}"
        }
      val joins = items.map { i =>
        val cond = i.keys.zipWithIndex
          .map { case (e, j) => s"__ujk.__uk$j <=> ($e)" }
          .mkString(" AND ")
        s"LEFT JOIN ${i.table} ${i.alias} ON $cond"
      }.mkString(" ")
      // trailing clauses (WHERE/GROUP/ORDER/LIMIT...) follow the select
      // list in Hive's inverted form — they must move AFTER the joins
      val (selList, trailing) = splitTrailing(sel)
      s"SELECT $selList FROM ($keySet) __ujk $joins $trailing".trim
    }
    case _ => None
  }

  /** Parses `[PRESERVE] tbl alias (exprs), ... SELECT tail`. */
  private def parse(s: String): Option[(Seq[Item], String)] = {
    var i = 0
    val n = s.length
    def ws(): Unit = { while (i < n && s.charAt(i).isWhitespace) i += 1 }
    def word(): String = {
      ws(); val b = i
      while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' ||
        s.charAt(i) == '.')) i += 1
      s.substring(b, i)
    }
    def parens(): Option[String] = {
      ws()
      if (i >= n || s.charAt(i) != '(') return None
      val b = i; var d = 0
      while (i < n) {
        val c = s.charAt(i)
        if (c == '(') d += 1
        else if (c == ')') { d -= 1; if (d == 0) { i += 1
          return Some(s.substring(b + 1, i - 1)) } }
        else if (c == '\'') { // skip literal
          i += 1
          while (i < n && s.charAt(i) != '\'') i += 1
        }
        i += 1
      }
      None
    }
    val items = Seq.newBuilder[Item]
    var done = false
    var sel: String = null
    while (!done) {
      var w = word()
      if (w.isEmpty) return None
      var preserve = false
      if (w.equalsIgnoreCase("PRESERVE")) { preserve = true; w = word() }
      val table = w
      if (table.isEmpty) return None
      ws()
      // alias is optional in the grammar but present in practice;
      // detect: next char '(' means no alias
      val alias =
        if (i < n && s.charAt(i) == '(') table.split("\\.").last
        else word()
      val keysRaw = parens().getOrElse(return None)
      val keys = splitTop(keysRaw)
      if (keys.isEmpty) return None
      items += Item(preserve, table, alias, keys)
      ws()
      if (i < n && s.charAt(i) == ',') i += 1
      else {
        val mark = i
        val nxt = word()
        if (nxt.equalsIgnoreCase("SELECT")) { sel = s.substring(i).trim
          done = true }
        else { i = mark; return None }
      }
    }
    if (sel == null || sel.isEmpty) None else Some((items.result(), sel))
  }

  /** Splits the post-SELECT tail into (select list, trailing clauses)
    * at the first depth-0 clause keyword.
    */
  private def splitTrailing(s: String): (String, String) = {
    val kw = Set("WHERE", "GROUP", "HAVING", "ORDER", "SORT", "CLUSTER",
      "DISTRIBUTE", "LIMIT")
    var d = 0
    var i = 0
    val n = s.length
    def isWord(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < n) {
      val c = s.charAt(i)
      if (c == '(') { d += 1; i += 1 }
      else if (c == ')') { d -= 1; i += 1 }
      else if (c == '\'') { i += 1
        while (i < n && s.charAt(i) != '\'') i += 1
        i += 1 }
      else if (isWord(c) && (i == 0 || !isWord(s.charAt(i - 1)))) {
        var j = i
        while (j < n && isWord(s.charAt(j))) j += 1
        if (d == 0 && kw.contains(s.substring(i, j).toUpperCase))
          return (s.substring(0, i).trim, s.substring(i).trim)
        i = j
      } else i += 1
    }
    (s.trim, "")
  }

  /** Splits an expression list on depth-0 commas. */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var d = 0; var b = 0
    for (i <- 0 until s.length) s.charAt(i) match {
      case '(' => d += 1
      case ')' => d -= 1
      case ',' if d == 0 => out += s.substring(b, i).trim; b = i + 1
      case _ => ()
    }
    out += s.substring(b).trim
    out.result().filter(_.nonEmpty)
  }
}
