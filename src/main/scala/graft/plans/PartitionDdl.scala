package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive's filter-form `ALTER TABLE ... DROP PARTITION` (ref ql/parse
  * partitionSelectorSpec; pinned by drop_partitions_filter.q and
  * escape1.q): partition specs may carry COMPARATORS — `(c='US', d<'2')`,
  * `(c>='US', d<='2')`, `(c != 'France')` — one statement may list
  * several PARTITION groups, and an equality spec may be PARTIAL
  * (`(ds='1')` over a (ds, part) table drops every matching partition).
  * Spark's parser rejects the comparator form outright and its v1 drop
  * refuses partial specs, so Engine.sql routes DROP PARTITION statements
  * here pre-parse; full-equality specs fall through to Spark's native
  * path (canonical behavior and errors preserved).
  *
  * Semantics (Hive's PartitionPruner over drop filters, replayed):
  *  - conditions inside one PARTITION group AND together; groups union;
  *  - values compare NUMERICALLY when both sides parse as numbers, else
  *    as strings (Hive compares with the partition column's type; the
  *    catalog here stores strings, so numeric-looking pairs promote);
  *  - a filter matching nothing is a silent no-op
  *    (hive.exec.drop.ignorenonexistent defaults true);
  *  - the `__HIVE_DEFAULT_PARTITION__` null slot never matches a
  *    comparator (NULL compares UNKNOWN).
  *
  * At warehouse scale this replaces N hand-written equality drops with
  * one statement — resolution is one catalog listing (no data scan) and
  * each drop is a metadata operation. Sessions under SQL authorization
  * require the table's UPDATE privilege, the same gate the
  * state-rewriting maintenance verbs use.
  */
object PartitionDdl {

  private val Head =
    ("""(?is)^\s*ALTER\s+TABLE\s+((?:`[^`]+`|[\w]+)(?:\.(?:`[^`]+`|[\w]+))*)""" +
      """\s+DROP\s+(?:IF\s+EXISTS\s+)?((?:PARTITION\s*\([^()]*\)\s*,?\s*)+?)(PURGE\s*)?$""").r
  private val Group = """(?is)PARTITION\s*\(([^()]*)\)""".r
  private val Cond =
    """(?s)^\s*(?:`([^`]+)`|(\w+))\s*(!=|<>|<=|>=|=|<|>)\s*(.+?)\s*$""".r

  private val DefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Hive/Spark path-escaped partition value (%xx) back to the raw value. */
  private[plans] def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hex = s.substring(i + 1, i + 3)
        try { sb.append(Integer.parseInt(hex, 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def stripQuotes(v: String): String = {
    val t = v.trim
    if (t.length >= 2 && ((t.head == '\'' && t.last == '\'') ||
        (t.head == '"' && t.last == '"')))
      t.substring(1, t.length - 1).replace("''", "'").replace("\\'", "'")
    else t
  }

  private def compare(a: String, b: String): Int =
    (scala.util.Try(BigDecimal(a)).toOption,
      scala.util.Try(BigDecimal(b)).toOption) match {
      case (Some(x), Some(y)) => x.compare(y)
      case _ => a.compareTo(b)
    }

  private case class Condition(col: String, op: String, value: String) {
    def matches(partValue: String): Boolean = {
      if (partValue == DefaultPartition) return false
      val c = compare(partValue, value)
      op match {
        case "=" => c == 0
        case "!=" | "<>" => c != 0
        case "<" => c < 0
        case ">" => c > 0
        case "<=" => c <= 0
        case ">=" => c >= 0
      }
    }
  }

  private val ColType =
    ("""(?is)^\s*ALTER\s+TABLE\s+((?:`[^`]+`|[\w]+)(?:\.(?:`[^`]+`|[\w]+))*)""" +
      """\s+PARTITION\s+COLUMN\s*\(\s*(?:`([^`]+)`|(\w+))\s+([\w]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s*\)\s*$""").r

  /** `ALTER TABLE t PARTITION COLUMN (col type)` — Hive's partition-key
    * type evolution (ref alter_partition_coltype.q; ql/ddl/table/
    * AlterTableAlterPartitionAnalyzer): a METADATA-ONLY retype of one
    * partition column. Catalog partition values are stored as strings
    * and convert to the schema type at planning, so existing partition
    * directories stay valid and predicates coerce under the NEW type
    * (dt='100' keeps matching after dt becomes int; ts='6.30' matches
    * the 6.3 double partition) — at warehouse scale this is the
    * alternative to rewriting every partition. Spark has no spelling
    * for it (the statement is a parse error), so it lands here.
    */
  private def maybeColType(spark: SparkSession,
      query: String): Option[DataFrame] = query.trim.stripSuffix(";") match {
    case ColType(table, bq, bare, typ) =>
      val col = Option(bq).getOrElse(bare)
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
      val cat = spark.sessionState.catalog
      val meta =
        try cat.getTableMetadata(ident)
        catch { case scala.util.control.NonFatal(_) => return None }
      require(meta.partitionColumnNames.exists(_.equalsIgnoreCase(col)),
        s"$col is not a partition column of $table " +
          s"(partition columns: ${meta.partitionColumnNames.mkString(", ")})")
      val dt = spark.sessionState.sqlParser.parseDataType(typ)
      Authz.requireRelationPrivilege(spark,
        table.split('.').toSeq.map(_.stripPrefix("`").stripSuffix("`")),
        "update")
      val newSchema = org.apache.spark.sql.types.StructType(meta.schema.map(
        f => if (f.name.equalsIgnoreCase(col)) f.copy(dataType = dt) else f))
      cat.alterTable(meta.copy(schema = newSchema))
      spark.catalog.refreshTable(table)
      import spark.implicits._
      Some(Seq(s"partition column $col retyped to ${dt.sql}")
        .toDF("result"))
    case _ => None
  }

  def maybeSql(spark: SparkSession, query: String): Option[DataFrame] =
    maybeColType(spark, query).orElse(maybeDrop(spark, query))

  private def maybeDrop(spark: SparkSession, query: String): Option[DataFrame] =
    query.trim.stripSuffix(";") match {
      case Head(table, groupsTxt, purge) =>
        val groups = Group.findAllMatchIn(groupsTxt).map(_.group(1)).toList
        def parseCond(s: String): Option[Condition] = s match {
          case Cond(bq, bare, op, v) =>
            Some(Condition(Option(bq).getOrElse(bare).toLowerCase,
              op, stripQuotes(v)))
          case _ => None
        }
        val parsed: Option[List[List[Condition]]] =
          groups.foldRight(Option(List.empty[List[Condition]])) { (g, acc) =>
            acc.flatMap { rest =>
              val conds = g.split(",").toList.map(parseCond)
              if (conds.forall(_.isDefined)) Some(conds.flatten :: rest)
              else None // not a recognizable condition list
            }
          }
        parsed.flatMap { specs =>
          val pcols: Seq[String] =
            try {
              val ident =
                spark.sessionState.sqlParser.parseTableIdentifier(table)
              spark.sessionState.catalog.getTableMetadata(ident)
                .partitionColumnNames.map(_.toLowerCase)
            } catch {
              // missing table / temp view / unparseable name: let the
              // native path produce its canonical error
              case scala.util.control.NonFatal(_) => return None
            }
          val isFullEquality = specs.forall(g =>
            g.forall(_.op == "=") && g.map(_.col).toSet == pcols.toSet)
          val knownCols = specs.forall(_.forall(c => pcols.contains(c.col)))
          // full-equality statements keep Spark's native semantics and
          // errors; unknown columns surface the canonical error too
          if (isFullEquality || !knownCols || pcols.isEmpty) return None
          Authz.requireRelationPrivilege(spark,
            table.split('.').toSeq.map(_.stripPrefix("`").stripSuffix("`")),
            "update")
          val parts = spark.sql(s"SHOW PARTITIONS $table")
            .collect().map(_.getString(0)).toSeq
          val dropped = parts.filter { p =>
            val kv = p.split("/").map { seg =>
              val Array(k, v) = seg.split("=", 2)
              k.toLowerCase -> unescapePathName(v)
            }.toMap
            specs.exists(g => g.forall(c => kv.get(c.col).exists(c.matches)))
          }
          dropped.foreach { p =>
            val spec = p.split("/").map { seg =>
              val Array(k, v) = seg.split("=", 2)
              val lit = unescapePathName(v)
                .replace("\\", "\\\\").replace("'", "\\'")
              s"`$k`='$lit'"
            }.mkString(", ")
            spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION ($spec)" +
              (if (purge != null) " PURGE" else ""))
          }
          import spark.implicits._
          Some(dropped.toDF("dropped_partition"))
        }
      case _ => None
    }
}
