package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.hadoop.hive.ql.exec.vector.StructColumnVector
import org.apache.orc.{OrcFile, TypeDescription}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.orc.GraftOrcColumnShim
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

/** COLUMNAR fast path for delete-free, base-only full-ACID snapshots —
  * the common post-compaction state (r15 verdict ask #7).
  *
  * Spark's own ORC readers cannot open ACID files at all: orc-core's
  * schema evolution detects the ACID wrapper struct and remaps batches
  * underneath them (measured in r16 — vectorized, row-based-native and
  * nested-vectorized all fail inside orc-core; see AcidColumnarSpec's
  * scaladoc for the probe). The row bridge in [[AcidOrc]] works but pays
  * per-row conversion: 3.6x slower than a plain columnar ORC scan of the
  * same rows at 10M rows (r16 measurement: 0.91s vs 0.25s min-of-3).
  *
  * This DSv2 source closes the gap for the state where ACID adds no
  * per-row work anyway: an identity orc-core `RecordReader` fills the
  * file's own wrapper batch, and the `row` struct's child vectors are
  * wrapped ZERO-COPY as Spark `OrcColumnVector`s into a `ColumnarBatch`
  * — whole-stage codegen consumes them exactly like a native ORC scan.
  * Column pruning reaches orc-core through include flags (only the
  * requested `row` children are decoded); files split by byte ranges
  * like the row bridge, so one giant compacted base still parallelizes.
  * Filter pushdown is NOT implemented (post-scan filtering; acceptable
  * for the prototype — the row bridge has none either).
  *
  * Engaged by [[AcidOrc.read]] only when every condition of the
  * post-compaction state holds (no deletes, no originals, no legacy
  * updates, unpartitioned, a single base/delta directory, no id
  * projection); `spark.graft.acid.columnarRead=false` forces the row
  * bridge back.
  */
class AcidColumnarOrc extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AcidColumnarOrc.rowSchema(
      AcidColumnarOrc.decodeSplits(options.get(AcidColumnarOrc.SplitsKey))
        .head.file)
  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AcidColumnarOrc.AcidTable(schema,
      properties.get(AcidColumnarOrc.SplitsKey),
      Option(properties.get(AcidColumnarOrc.PartColsKey)).getOrElse(""))
}

object AcidColumnarOrc {

  private[sources] val SplitsKey = "graft.acid.splits"
  private val Sep = "\u0001"

  /** file  offset  length, one split per \n. */
  private[sources] def encodeSplits(
      ss: Seq[(String, Long, Long, String)]): String =
    ss.map { case (f, o, l, part) => s"$f$Sep$o$Sep$l$Sep$part" }
      .mkString("\n")

  private[sources] def decodeSplits(s: String): Seq[AcidColumnarSplit] =
    s.split('\n').toSeq.map { line =>
      val parts = line.split(Sep, -1)
      AcidColumnarSplit(parts(0), parts(1).toLong, parts(2).toLong,
        if (parts.length > 3) parts(3) else "")
    }

  /** The `row` struct schema of an ACID file, as Catalyst fields. */
  private[sources] def rowSchema(file: String): StructType = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val r = OrcFile.createReader(new Path(file), OrcFile.readerOptions(conf))
    try {
      val td = r.getSchema
      val idx = rowFieldIndex(td)
      AcidOrc.toCatalyst(td.getChildren.get(idx)) match {
        case st: StructType => st
        case other => throw new IllegalStateException(
          s"ACID row column is not a struct in $file: $other")
      }
    } finally r.close()
  }

  private def rowFieldIndex(td: TypeDescription): Int = {
    val names = td.getFieldNames
    val i = (0 until names.size()).indexWhere(j => names.get(j) == "row")
    require(i >= 0, "not an ACID wrapper schema: " + td)
    i
  }

  /** Entry used by AcidOrc.read's fast-path gate. `schema` is the row
    * struct plus trailing STRING partition columns (values come from
    * each split's partSub as constant vectors — the same raw dir-segment
    * values the row bridge surfaces).
    */
  private[sources] def scan(spark: SparkSession, schema: StructType,
      partCols: Seq[String],
      splits: Seq[(String, Long, Long, String)]): DataFrame =
    spark.read.format(classOf[AcidColumnarOrc].getName)
      .schema(schema)
      .option(SplitsKey, encodeSplits(splits))
      .option(PartColsKey, partCols.mkString(","))
      .load()

  private[sources] val PartColsKey = "graft.acid.partcols"

  private[sources] case class AcidColumnarSplit(file: String, offset: Long,
      length: Long, partSub: String) extends InputPartition

  private class AcidTable(schema: StructType, splits: String,
      partCols: String) extends Table with SupportsRead {
    override def name(): String = "graft-acid-columnar"
    override def schema(): StructType = schema
    override def capabilities(): util.Set[TableCapability] =
      Set(TableCapability.BATCH_READ).asJava
    override def newScanBuilder(
        options: CaseInsensitiveStringMap): ScanBuilder =
      new AcidScanBuilder(schema, splits, partCols)
  }

  private class AcidScanBuilder(full: StructType, splits: String,
      partCols: String) extends ScanBuilder
      with SupportsPushDownRequiredColumns {
    private var required: StructType = full
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema
    override def build(): Scan = new AcidScan(required, splits, partCols)
  }

  private class AcidScan(required: StructType, splits: String,
      partCols: String) extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      decodeSplits(splits).toArray
    override def createReaderFactory(): PartitionReaderFactory = {
      // ship the resolved FS conf the same way the row bridge does
      val conf = SparkSession.active.sparkContext.hadoopConfiguration
      val bos = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(bos)
      conf.write(dos)
      dos.close()
      new AcidReaderFactory(required,
        partCols.split(",").filter(_.nonEmpty).toSeq, bos.toByteArray)
    }
  }

  private class AcidReaderFactory(required: StructType,
      partCols: Seq[String], confBytes: Array[Byte])
      extends PartitionReaderFactory {
    override def supportColumnarReads(p: InputPartition): Boolean = true
    override def createReader(
        p: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
      throw new UnsupportedOperationException(
        "columnar-only source — Spark must call createColumnarReader")
    override def createColumnarReader(
        p: InputPartition): PartitionReader[ColumnarBatch] = {
      val split = p.asInstanceOf[AcidColumnarSplit]
      val conf = new org.apache.hadoop.conf.Configuration(false)
      conf.readFields(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(confBytes)))
      val reader = OrcFile.createReader(new Path(split.file),
        OrcFile.readerOptions(conf))
      val td = reader.getSchema
      val rowIdx = rowFieldIndex(td)
      val rowTd = td.getChildren.get(rowIdx)
      val rowNames = {
        val ns = rowTd.getFieldNames
        (0 until ns.size()).map(ns.get)
      }
      // each split's partition values come from its own k=v subpath —
      // surfaced RAW (same dir-segment strings the row bridge extracts)
      val partVals: Map[String, String] = split.partSub.split("/")
        .filter(_.nonEmpty).map { seg =>
          val Array(k, v) = seg.split("=", 2)
          k.toLowerCase -> v
        }.toMap
      val partSet = partCols.map(_.toLowerCase).toSet
      // positive index = row child; -1 = partition constant
      val fieldIdx = required.fields.map { f =>
        if (partSet.contains(f.name.toLowerCase)) -1
        else {
          val i = rowNames.indexOf(f.name)
          require(i >= 0, s"${split.file} lacks row column ${f.name} — " +
            "the fast-path gate must not engage across schema evolution")
          i
        }
      }
      // include flags: decode only the requested row children (their
      // whole subtrees), the row struct itself, and the root
      val include = new Array[Boolean](td.getMaximumId + 1)
      include(0) = true
      include(rowTd.getId) = true
      fieldIdx.filter(_ >= 0).foreach { i =>
        val child = rowTd.getChildren.get(i)
        (child.getId to child.getMaximumId).foreach(include(_) = true)
      }
      val rows = reader.rows(reader.options.schema(td).include(include)
        .range(split.offset, split.length))
      val batch = td.createRowBatch()
      val structCv = batch.cols(rowIdx).asInstanceOf[StructColumnVector]
      val vectors = required.fields.zip(fieldIdx).map {
        case (f, -1) =>
          val cv = new org.apache.spark.sql.execution.vectorized
            .ConstantColumnVector(batch.getMaxSize, f.dataType)
          partVals.get(f.name.toLowerCase) match {
            case Some(v) => cv.setUtf8String(
              org.apache.spark.unsafe.types.UTF8String.fromString(v))
            case None => cv.setNull()
          }
          cv: org.apache.spark.sql.vectorized.ColumnVector
        case (f, i) =>
          GraftOrcColumnShim.wrap(f.dataType, structCv.fields(i))
      }
      val cb = new ColumnarBatch(vectors.toArray)
      new PartitionReader[ColumnarBatch] {
        override def next(): Boolean = {
          val more = rows.nextBatch(batch)
          if (more) {
            vectors.foreach {
              case v: org.apache.spark.sql.execution.datasources.orc.OrcColumnVector =>
                GraftOrcColumnShim.setBatchSize(v, batch.size)
              case _ => () // constant partition vectors are size-free
            }
            cb.setNumRows(batch.size)
          }
          more
        }
        override def get(): ColumnarBatch = cb
        override def close(): Unit = {
          try rows.close() finally reader.close()
        }
      }
    }
  }
}
