package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.RebaseDateTime
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, DateType, TimestampType}

/** `datetime_legacy_hybrid_calendar(x)` — re-render a proleptic value
  * with the legacy hybrid calendar's fields (see the HiveFunctions
  * registration for provenance). Field-preserving day/micros rebase;
  * dates at/after the Gregorian cutover are unchanged. Rare-path
  * function → CodegenFallback.
  */
case class HybridCalendar(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DateType | TimestampType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"datetime_legacy_hybrid_calendar needs date or timestamp, " +
            s"got ${other.simpleString}")
    }
  override def nullSafeEval(input: Any): Any = child.dataType match {
    case DateType =>
      RebaseDateTime.rebaseJulianToGregorianDays(input.asInstanceOf[Int])
    case TimestampType =>
      RebaseDateTime.rebaseJulianToGregorianMicros(
        SQLConf.get.sessionLocalTimeZone, input.asInstanceOf[Long])
  }
  override protected def withNewChildInternal(c: Expression): HybridCalendar =
    copy(child = c)
}
