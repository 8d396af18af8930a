package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating functions Spark lacks (SURVEY §2.6).
  *
  * parse_url_tuple (ref ql/src/java/org/apache/hadoop/hive/ql/udf/generic/
  * GenericUDTFParseUrlTuple.java): one row with a column per requested URL
  * part. Part names: HOST, PATH, QUERY, REF, PROTOCOL, FILE, AUTHORITY,
  * USERINFO, QUERY:<key>.
  */
case class ParseUrlTuple(children: Seq[Expression])
    extends Generator with CodegenFallback {

  private val partNames: Seq[String] = children.tail.map {
    case e if e.foldable =>
      Option(e.eval(null)).map(_.toString).getOrElse("")
    case _ => throw new IllegalArgumentException(
      "parse_url_tuple part names must be string literals")
  }

  override def elementSchema: StructType =
    StructType(partNames.zipWithIndex.map { case (p, i) =>
      StructField(s"c$i", StringType, nullable = true)
    })

  private def extract(url: String, part: String): UTF8String = {
    try {
      val u = new java.net.URI(url)
      val v: String = part.toUpperCase match {
        case "HOST" => u.getHost
        case "PATH" => u.getRawPath
        case "QUERY" => u.getRawQuery
        case "REF" => u.getRawFragment
        case "PROTOCOL" => u.getScheme
        case "AUTHORITY" => u.getRawAuthority
        case "USERINFO" => u.getRawUserInfo
        case "FILE" =>
          val q = u.getRawQuery
          if (q == null) u.getRawPath else u.getRawPath + "?" + q
        case p if p.startsWith("QUERY:") =>
          val key = part.substring("QUERY:".length)
          val q = u.getRawQuery
          if (q == null) null
          else q.split("&").collectFirst {
            case kv if kv.takeWhile(_ != '=') == key =>
              val idx = kv.indexOf('=')
              if (idx < 0) "" else kv.substring(idx + 1)
          }.orNull
        case _ => null
      }
      if (v == null) null else UTF8String.fromString(v)
    } catch { case _: Exception => null }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val url = children.head.eval(input)
    if (url == null) {
      Seq(InternalRow.fromSeq(partNames.map(_ => null)))
    } else {
      val s = url.asInstanceOf[UTF8String].toString
      Seq(InternalRow.fromSeq(partNames.map(p => extract(s, p))))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ParseUrlTuple = copy(children = newChildren)
}

/** replicate_rows(n, col1, col2, ...): emits n copies of the row
  * (ref ql/src/java/org/apache/hadoop/hive/ql/udf/generic/
  * GenericUDTFReplicateRows.java).
  */
case class ReplicateRows(children: Seq[Expression])
    extends Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(children.tail.zipWithIndex.map { case (e, i) =>
      StructField(s"col$i", e.dataType, e.nullable)
    })

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val n = children.head.eval(input)
    if (n == null) Nil
    else {
      val count = n.asInstanceOf[Number].longValue()
      val values = children.tail.map(_.eval(input))
      (0L until count).map(_ => InternalRow.fromSeq(values))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ReplicateRows = copy(children = newChildren)
}
