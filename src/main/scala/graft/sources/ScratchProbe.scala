package graft.sources

// scratch accessibility probe — deleted before commit
object ScratchProbe {
  def probe(): Unit = {
    val c1 = classOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory]
    val c2 = classOf[org.apache.spark.sql.execution.datasources.FilePartition]
    val c3 = classOf[org.apache.spark.sql.execution.datasources.PartitionedFile]
    val c4 = org.apache.spark.sql.execution.datasources.parquet.ParquetOptions
    val c5 = classOf[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]
    val c6 = classOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val c7 = classOf[org.apache.spark.sql.connector.catalog.FunctionCatalog]
    val c8 = org.apache.spark.sql.connector.expressions.Expressions.bucket(8, "k")
    val c9 = classOf[org.apache.spark.sql.connector.read.HasPartitionKey]
    println(Seq(c1, c2, c3, c4, c5, c6, c7, c8, c9).map(_.toString).mkString(","))
  }

  def mk(sqlConf: org.apache.spark.sql.internal.SQLConf,
      b: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration],
      dataSchema: org.apache.spark.sql.types.StructType,
      readDataSchema: org.apache.spark.sql.types.StructType,
      partitionSchema: org.apache.spark.sql.types.StructType,
      filters: Array[org.apache.spark.sql.sources.Filter],
      opts: org.apache.spark.sql.execution.datasources.parquet.ParquetOptions) = {
    org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory(
      sqlConf, b, dataSchema, readDataSchema, partitionSchema, filters, None, opts)
  }
}
