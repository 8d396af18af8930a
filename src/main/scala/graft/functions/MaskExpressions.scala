package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hive mask_* family (ref ql/src/java/org/apache/hadoop/hive/ql/udf/generic/
  * GenericUDFMaskFirstN.java and siblings; registered at
  * FunctionRegistry.java:700-706). Hive default masking: upper->X, lower->x,
  * digit->n, other chars unchanged. Spark ships plain `mask` only; the
  * positional variants are provided here.
  *
  * `n < 0` clamps to 0 (GenericUDFMaskFirstN: `if (charCount < 0) charCount =
  * 0`); the default of 4 applies only when the argument is absent and is
  * supplied by the registration site (HiveFunctions).
  */
/** mask_hash (ref GenericUDFMaskHash.java): sha256 hex of STRING-family
  * values only — every other type answers NULL (Hive's MaskHashTransformer
  * guards on STRING/VARCHAR/CHAR; udf_mask_hash.q pins tinyint..date →
  * NULL). Type-dependent, so the dispatch happens post-resolution via
  * RuntimeReplaceable.
  */
case class MaskHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Sha2}
  override lazy val replacement: Expression = child.dataType match {
    case StringType =>
      Sha2(Cast(child, org.apache.spark.sql.types.BinaryType), Literal(256))
    case _ => Literal.create(null, StringType)
  }
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

case class MaskRange(child: Expression, n: Int, fromStart: Boolean,
    show: Boolean, upper: Char = 'X', lower: Char = 'x', digit: Char = 'n',
    other: Option[Char] = None)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType

  private def maskChar(c: Char): Char =
    if (c.isUpper) upper else if (c.isLower) lower
    else if (c.isDigit) digit else other.getOrElse(c)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val nn = if (n < 0) 0 else n
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val inRange = if (fromStart) i < nn else i >= s.length - nn
      // show=true masks OUTSIDE the range (mask_show_first_n etc)
      val doMask = if (show) !inRange else inRange
      out.append(if (doMask) maskChar(s.charAt(i)) else s.charAt(i))
      i += 1
    }
    UTF8String.fromString(out.toString)
  }
  override protected def withNewChildInternal(c: Expression): MaskRange = copy(child = c)
}
