package graft.plans

import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.plans.logical.{AddColumns, ColumnDefinition, CreateTable, CreateTableAsSelect, LogicalPlan, ReplaceTable}
import org.apache.spark.sql.types._

/** Hive bounds its parameterized character types: CHAR holds at most 255
  * and VARCHAR at most 65535, and zero-length forms are refused (ref
  * serde2/typeinfo/BaseCharUtils.validateCharParameter /
  * validateVarcharParameter; pinned by the clientnegative
  * invalid_char_length_{1,2,3}.q family). Spark accepts any
  * non-negative length, so a Hive-invalid schema would silently create.
  *
  * Front-door check (Engine.sql, post-parse): DDL column definitions and
  * CAST target types are walked for out-of-range CHAR/VARCHAR and the
  * statement refuses with the reference's bound in the message. Only
  * these statement shapes are inspected — nothing about a valid
  * statement changes.
  */
object TypeLimits {

  val MaxChar = 255
  val MaxVarchar = 65535

  def check(plan: LogicalPlan): Unit = {
    def checkType(dt: DataType): Unit = dt match {
      case c: CharType =>
        require(c.length >= 1 && c.length <= MaxChar,
          s"char(${c.length}): length must be between 1 and $MaxChar " +
            "(the reference's CHAR bound)")
      case v: VarcharType =>
        require(v.length >= 1 && v.length <= MaxVarchar,
          s"varchar(${v.length}): length must be between 1 and " +
            s"$MaxVarchar (the reference's VARCHAR bound)")
      case s: StructType => s.fields.foreach(f => checkType(f.dataType))
      case a: ArrayType => checkType(a.elementType)
      case m: MapType => checkType(m.keyType); checkType(m.valueType)
      case _ => ()
    }
    def checkCols(cols: Seq[ColumnDefinition]): Unit =
      cols.foreach(c => checkType(c.dataType))
    plan.foreach {
      case ct: CreateTable => checkCols(ct.columns)
      case rt: ReplaceTable => checkCols(rt.columns)
      case _: CreateTableAsSelect => () // target types come from the query
      case ac: AddColumns =>
        ac.columnsToAdd.foreach(c => checkType(c.dataType))
      case node =>
        node.expressions.foreach(_.foreach {
          case c: Cast => checkType(c.dataType)
          case _ => ()
        })
    }
  }
}
