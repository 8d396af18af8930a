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
      properties.get(AcidColumnarOrc.SplitsKey))
}

object AcidColumnarOrc {

  private[sources] val SplitsKey = "graft.acid.splits"
  private val Sep = "\u0001"

  /** file  offset  length, one split per \n. */
  private[sources] def encodeSplits(ss: Seq[(String, Long, Long)]): String =
    ss.map { case (f, o, l) => s"$f$Sep$o$Sep$l" }.mkString("\n")

  private[sources] def decodeSplits(s: String): Seq[AcidColumnarSplit] =
    s.split('\n').toSeq.map { line =>
      val Array(f, o, l) = line.split(Sep)
      AcidColumnarSplit(f, o.toLong, l.toLong)
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

  /** Entry used by AcidOrc.read's fast-path gate. */
  private[sources] def scan(spark: SparkSession, schema: StructType,
      splits: Seq[(String, Long, Long)]): DataFrame =
    spark.read.format(classOf[AcidColumnarOrc].getName)
      .schema(schema)
      .option(SplitsKey, encodeSplits(splits))
      .load()

  private[sources] case class AcidColumnarSplit(file: String, offset: Long,
      length: Long) extends InputPartition

  private class AcidTable(schema: StructType, splits: String)
      extends Table with SupportsRead {
    override def name(): String = "graft-acid-columnar"
    override def schema(): StructType = schema
    override def capabilities(): util.Set[TableCapability] =
      Set(TableCapability.BATCH_READ).asJava
    override def newScanBuilder(
        options: CaseInsensitiveStringMap): ScanBuilder =
      new AcidScanBuilder(schema, splits)
  }

  private class AcidScanBuilder(full: StructType, splits: String)
      extends ScanBuilder with SupportsPushDownRequiredColumns {
    private var required: StructType = full
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema
    override def build(): Scan = new AcidScan(required, splits)
  }

  private class AcidScan(required: StructType, splits: String)
      extends Scan with Batch {
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
      new AcidReaderFactory(required, bos.toByteArray)
    }
  }

  private class AcidReaderFactory(required: StructType,
      confBytes: Array[Byte]) extends PartitionReaderFactory {
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
      val fieldIdx = required.fields.map { f =>
        val i = rowNames.indexOf(f.name)
        require(i >= 0, s"${split.file} lacks row column ${f.name} — the " +
          "fast-path gate must not engage across schema evolution")
        i
      }
      // include flags: decode only the requested row children (their
      // whole subtrees), the row struct itself, and the root
      val include = new Array[Boolean](td.getMaximumId + 1)
      include(0) = true
      include(rowTd.getId) = true
      fieldIdx.foreach { i =>
        val child = rowTd.getChildren.get(i)
        (child.getId to child.getMaximumId).foreach(include(_) = true)
      }
      val rows = reader.rows(reader.options.schema(td).include(include)
        .range(split.offset, split.length))
      val batch = td.createRowBatch()
      val structCv = batch.cols(rowIdx).asInstanceOf[StructColumnVector]
      val vectors = required.fields.zip(fieldIdx).map { case (f, i) =>
        GraftOrcColumnShim.wrap(f.dataType, structCv.fields(i))
      }
      val cb = new ColumnarBatch(vectors.toArray)
      new PartitionReader[ColumnarBatch] {
        override def next(): Boolean = {
          val more = rows.nextBatch(batch)
          if (more) {
            vectors.foreach(GraftOrcColumnShim.setBatchSize(_, batch.size))
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
