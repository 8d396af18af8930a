package graft.plans

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation, PartitioningAwareFileIndex}

/** Query results cache — the engine analog of Hive's QueryResultsCache
  * (ref ql/src/java/org/apache/hadoop/hive/ql/cache/results/
  * QueryResultsCache.java): a repeated deterministic query over unchanged
  * inputs is answered from a materialized result instead of re-executing.
  *
  * Correctness model: the cache key is the canonicalized optimized plan's
  * semantic hash PLUS a digest of every input file's (path, size, modTime)
  * from the plan's own file indexes — all plan-time metadata, no extra
  * filesystem listing. Any change to the inputs (new snapshot version,
  * appended file, rewritten partition) changes the digest, so a stale entry
  * can never be served; it simply stops being referenced and ages out LRU.
  * Plans containing a non-deterministic expression are never cached
  * (current_date/timestamp ARE cacheable: the optimizer folds them to
  * literals, so the key shifts whenever the folded value does).
  *
  * At 100 TB the win is the same as the reference's: dashboard-style
  * repeated aggregates skip the full scan entirely; the cached artifact is
  * result-sized (KBs), not input-sized.
  *
  * Scope: single-warehouse, filesystem-backed (`<dir>/_index.json` +
  * one parquet directory per entry), LRU-bounded by entry count. Concurrent
  * sessions race benignly: the loser of an index write re-materializes.
  */
object ResultsCache {

  final case class Stats(hits: Long, misses: Long, skipped: Long)

  private final case class Entry(sub: String, lastUsedMs: Long)
  private final case class Index(entries: Map[String, Entry])
  private implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats

  @volatile private var hits = 0L
  @volatile private var misses = 0L
  @volatile private var skipped = 0L
  def stats: Stats = Stats(hits, misses, skipped)
  def resetStats(): Unit = { hits = 0; misses = 0; skipped = 0 }

  /** The cache key for `df`, or None when the plan must not be cached
    * (non-deterministic expressions, streaming, or no file-backed inputs —
    * a pure VALUES query is cheaper to re-run than to read back).
    */
  private[plans] def fingerprint(df: DataFrame): Option[String] = {
    if (df.isStreaming) return None
    val plan = df.queryExecution.optimizedPlan
    val nodes = plan.collectWithSubqueries { case p => p }
    val deterministic = nodes.forall(_.expressions.forall(_.deterministic))
    if (!deterministic) return None
    val inputs = nodes.flatMap {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location match {
          case p: PartitioningAwareFileIndex =>
            p.allFiles().map(s =>
              s"${s.getPath}|${s.getLen}|${s.getModificationTime}")
          case other =>
            // custom indexes (e.g. the snapshot manifest FileIndex) pin the
            // exact file set in the plan; path+size identifies the version
            other.inputFiles.sorted.map(f => s"$f|${other.sizeInBytes}")
        }
      case _ => Nil
    }
    if (inputs.isEmpty) return None
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(plan.canonicalized.toString.getBytes(UTF_8))
    inputs.sorted.foreach(s => md.update(s.getBytes(UTF_8)))
    Some(md.digest().map("%02x".format(_)).mkString)
  }

  /** Return `df`'s result from the cache at `dir`, materializing it on a
    * miss. Boolean = was it a hit. Uncacheable plans pass through untouched.
    */
  def cachedOrRun(spark: SparkSession, df: DataFrame, dir: String,
      maxEntries: Int = 64): (DataFrame, Boolean) = synchronized {
    fingerprint(df) match {
      case None => skipped += 1; (df, false)
      case Some(fp) =>
        val root = new Path(dir)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val idxPath = new Path(root, "_index.json")
        val idx = if (fs.exists(idxPath)) {
          val in = fs.open(idxPath)
          try org.json4s.jackson.Serialization.read[Index](
            new String(org.apache.commons.io.IOUtils.toByteArray(in), UTF_8))
          finally in.close()
        } else Index(Map.empty)
        val now = System.currentTimeMillis()
        idx.entries.get(fp) match {
          case Some(e) if fs.exists(new Path(root, e.sub)) =>
            hits += 1
            writeIndex(fs, idxPath, Index(idx.entries +
              (fp -> e.copy(lastUsedMs = now))))
            (spark.read.parquet(new Path(root, e.sub).toString), true)
          case _ =>
            misses += 1
            val sub = s"r_$fp"
            df.coalesce(1).write.mode("overwrite")
              .parquet(new Path(root, sub).toString)
            // LRU eviction beyond maxEntries (the new entry always stays)
            val entries = idx.entries + (fp -> Entry(sub, now))
            val evict = entries.toSeq.sortBy(_._2.lastUsedMs).dropRight(maxEntries)
            evict.foreach { case (_, e) =>
              fs.delete(new Path(root, e.sub), true) }
            writeIndex(fs, idxPath, Index(entries -- evict.map(_._1)))
            (spark.read.parquet(new Path(root, sub).toString), false)
        }
    }
  }

  private def writeIndex(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      idx: Index): Unit = {
    val out = fs.create(p, true)
    try out.write(org.json4s.jackson.Serialization.write(idx).getBytes(UTF_8))
    finally out.close()
  }
}
