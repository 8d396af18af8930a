package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: assign documents to
  * fixed-capacity token windows ("packs") so that each pack's token sum
  * stays within `capacity` — the standard pretraining step that turns a
  * cleaned corpus into dense fixed-length samples with minimal padding.
  *
  * Algorithm: best-fit-decreasing per bucket. Documents are hashed into
  * `numBuckets` independent packing domains (md5 of the id — deterministic,
  * RNG-free), each bucket's documents are sorted by (tokens desc, md5(id))
  * and packed greedily into the open pack with the least remaining capacity
  * that still fits (a capacity-indexed TreeMap: O(n log n) per bucket,
  * ~11/9 x optimal fill in the worst case, near-optimal in practice).
  * Documents longer than `capacity` get a pack of their own, flagged
  * `overflow` (chunk upstream if that is not wanted).
  *
  * Scale: one shuffle keyed by bucket; packing runs partition-local with
  * O(open packs) state per bucket. Buckets are independent, so parallelism
  * = numBuckets regardless of corpus size, and determinism is per-bucket:
  * re-running a failed stage, or packing on a different cluster size,
  * produces byte-identical assignments.
  *
  * Output: one row per document — (idCol, tokenCol, pack_id, pack_pos,
  * overflow), where pack_id is globally unique (bucket in the high bits)
  * and pack_pos is the document's order within its pack.
  */
object Packing {

  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      capacity: Int, numBuckets: Int = 64): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(numBuckets > 0 && numBuckets <= (1 << 20), "1..2^20 buckets")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // the id rides through in its ORIGINAL type (string/UUID ids must not be
    // silently cast — a long cast would null them and corrupt every row)
    val idType = df.schema(idCol).dataType
    val prepped = df.select(
        col(idCol).as("id"),
        col(tokenCol).cast("int").as("tokens"),
        md5(col(idCol).cast("string").cast("binary")).as("__h"))
      .withColumn("bucket",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"),
          lit(numBuckets.toLong)).cast("int"))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("tokens").desc, col("__h"), col("id"))
      .select(col("bucket"), col("id"), col("tokens"))
    val outSchema = StructType(Seq(
      StructField("id", idType),
      StructField("tokens", IntegerType),
      StructField("pack_id", LongType, nullable = false),
      StructField("pack_pos", IntegerType, nullable = false),
      StructField("overflow", BooleanType, nullable = false)))
    prepped.mapPartitions { it =>
      // partitions hold whole buckets (hash-partitioned on bucket) and rows
      // arrive bucket-contiguous, tokens-descending
      new Iterator[Row] {
        private val buf = it.buffered
        private var bucket = -1
        private var nextPack = 0L
        // remaining capacity -> FIFO of (packId, nextPos); FIFO keeps the
        // choice among equal remainders deterministic (oldest pack wins)
        private var open: java.util.TreeMap[Int, scala.collection.mutable.Queue[(Long, Int)]] = _
        private def reset(b: Int): Unit = {
          bucket = b; nextPack = 0L
          open = new java.util.TreeMap[Int, scala.collection.mutable.Queue[(Long, Int)]]()
        }
        override def hasNext: Boolean = buf.hasNext
        override def next(): Row = {
          val r = buf.next()
          val b = r.getInt(0)
          val id = r.get(1)
          val tokens = r.getInt(2)
          if (b != bucket) reset(b)
          val globalBase = b.toLong << 40
          if (tokens > capacity) {
            // oversize: its own flagged pack, never entered into `open`
            val p = nextPack; nextPack += 1
            Row(id, tokens, globalBase | p, 0, true)
          } else {
            val entry = open.ceilingEntry(tokens)
            if (entry == null) {
              val p = nextPack; nextPack += 1
              val rem = capacity - tokens
              if (rem > 0)
                open.computeIfAbsent(rem, _ => scala.collection.mutable.Queue.empty)
                  .enqueue((p, 1))
              Row(id, tokens, globalBase | p, 0, false)
            } else {
              val rem = entry.getKey
              val q = entry.getValue
              val (p, pos) = q.dequeue()
              if (q.isEmpty) open.remove(rem)
              val newRem = rem - tokens
              if (newRem > 0)
                open.computeIfAbsent(newRem, _ => scala.collection.mutable.Queue.empty)
                  .enqueue((p, pos + 1))
              Row(id, tokens, globalBase | p, pos, false)
            }
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .withColumnRenamed("id", idCol)
      .withColumnRenamed("tokens", tokenCol)
  }

  /** Pack-level summary: documents, token fill, fill ratio per pack. */
  def packStats(packed: DataFrame, tokenCol: String, capacity: Int): DataFrame =
    packed.groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("n_tokens"),
        max(col("overflow")).as("overflow"))
      .withColumn("fill_ratio",
        round(col("n_tokens").cast("double") / capacity, 4))
}
