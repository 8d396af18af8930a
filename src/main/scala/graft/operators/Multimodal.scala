package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch operators.
  *
  * The Spark-side plumbing (schema, partitioning, batch iteration, typed
  * Datasets) is real; the codec layer is a clearly marked deterministic STUB
  * (this container has no image/audio libraries). Swapping `StubCodec` for a
  * real decoder (e.g. javacv / a JNI codec) changes no plan shapes: decode is
  * embarrassingly parallel map-side work that scales with partition count.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, duration_ms: Long)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      byte_entropy: Double, histogram: Array[Double])

  case class Frame(media_id: Long, frame_idx: Int, bytes: Array[Byte])

  /** ===== STUB codec =====
    * Deterministic fake "decode": a header of [kind tag][w][h][duration] is
    * parsed from the first bytes; payload is treated as raw samples. A real
    * implementation would replace only this object.
    */
  object StubCodec {
    def decodeDims(bytes: Array[Byte]): (Int, Int) =
      if (bytes.length < 8) (0, 0)
      else ((bytes(0) & 0x7f) + 1, (bytes(1) & 0x7f) + 1)

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      // STUB: real impl would rescale pixels; we deterministically subsample.
      val n = math.max(1, math.min(bytes.length, w * h))
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) { out(i) = bytes((i.toLong * bytes.length / n).toInt); i += 1 }
      out
    }
  }

  /** Deterministic synthetic media table derived from the shared `documents`
    * testdata (text bytes as payload) — exercises the binary-column plumbing
    * without external fixtures.
    */
  def syntheticMediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Engine.table(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang")
      .map { r =>
        val id = r.getLong(0)
        val bytes = r.getString(1).getBytes("UTF-8")
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        val (w, h) = StubCodec.decodeDims(bytes)
        MediaRow(id, kind, bytes, w, h, bytes.length.toLong * 10)
      }
  }

  /** Per-partition batch feature extraction (histogram + entropy). This is
    * the mapPartitions shape a vectorized decode would use: one codec init
    * per partition, batched row iteration.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // codec/model init would happen once per partition here
      rows.map { m =>
        val hist = new Array[Double](16)
        var i = 0
        while (i < m.bytes.length) { hist((m.bytes(i) & 0xff) / 16) += 1; i += 1 }
        val n = math.max(1, m.bytes.length)
        var entropy = 0.0
        var j = 0
        while (j < 16) {
          val p = hist(j) / n
          if (p > 0) entropy -= p * math.log(p) / math.log(2)
          hist(j) = p
          j += 1
        }
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, entropy, hist)
      }
    }
  }

  /** Frame sampling for video-kind rows: every `stride`-th 64-byte chunk
    * becomes a "frame" (STUB chunking; a real impl samples keyframes).
    * 1 row -> N rows, the UDTF/Generator shape.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.bytes.grouped(64).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, idx) => Frame(m.media_id, idx, chunk) }
    }
  }

  /** Declarative metadata filters stay codegen'd columnar ops — binary
    * payloads are only touched inside the partition-local codec stage.
    */
  def filterByDims(media: Dataset[MediaRow], minW: Int, minH: Int): Dataset[MediaRow] =
    media.filter(col("width") >= minW && col("height") >= minH)
      .as[MediaRow](media.encoder)

  /** Resize pipeline stage (STUB resample, real plumbing). */
  def resizeAll(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(m => m.copy(bytes = StubCodec.resize(m.bytes, w, h),
        width = w, height = h))
    }
  }

  /** Media stats summary as a plain DataFrame op (joins features back to
    * metadata; demonstrates mixing typed and untyped APIs).
    */
  def mediaSummary(media: Dataset[MediaRow]): DataFrame = {
    val feats = extractFeatures(media)
    feats.groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("byte_entropy")), 4).as("avg_entropy"),
        sum(col("n_bytes")).as("total_bytes"))
      .orderBy(col("kind"))
  }
}
