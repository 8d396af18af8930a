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
    // a NullType column cannot round-trip through parquet — caching such a
    // result would FAIL a query that runs fine uncached
    def hasVoid(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case org.apache.spark.sql.types.NullType => true
      case st: org.apache.spark.sql.types.StructType => st.fields.exists(f => hasVoid(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasVoid(a.elementType)
      case m: org.apache.spark.sql.types.MapType => hasVoid(m.keyType) || hasVoid(m.valueType)
      case _ => false
    }
    if (df.schema.fields.exists(f => hasVoid(f.dataType))) return None
    val plan = df.queryExecution.optimizedPlan
    val nodes = plan.collectWithSubqueries { case p => p }
    val deterministic = nodes.forall(_.expressions.forall(_.deterministic))
    if (!deterministic) return None
    // every leaf must be fingerprintable, or caching is refused outright:
    // a plan mixing parquet with a non-file source (KV handler, JDBC)
    // would otherwise key on the parquet side only — a write to the other
    // source could not shift the key, and a stale result would serve
    val fingerprintableLeaves = nodes.filter(_.children.isEmpty).forall {
      case LogicalRelation(_: HadoopFsRelation, _, _, _, _) => true
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case _: org.apache.spark.sql.catalyst.plans.logical.OneRowRelation => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Range => true
      case _ => false
    }
    if (!fingerprintableLeaves) return None
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
    *
    * Locking: only the `_index.json` read-modify-write is serialized — the
    * expensive part (executing the query and writing its parquet) runs
    * OUTSIDE the lock, so concurrent cached queries don't queue behind one
    * another's scans. Two threads missing on the same fingerprint both
    * materialize (to the same deterministic path, last write wins) — wasted
    * work, never a wrong answer.
    */
  def cachedOrRun(spark: SparkSession, df: DataFrame, dir: String,
      maxEntries: Int = 64): (DataFrame, Boolean) =
    fingerprint(df) match {
      case None => synchronized { skipped += 1 }; (df, false)
      case Some(fp) =>
        val root = new Path(dir)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val idxPath = new Path(root, "_index.json")
        val now = System.currentTimeMillis()
        val hit = synchronized {
          val idx = SidecarJson.read[Index](fs, idxPath).getOrElse(Index(Map.empty))
          idx.entries.get(fp).filter(e => fs.exists(new Path(root, e.sub)))
            .map { e =>
              hits += 1
              SidecarJson.write(fs, idxPath, Index(idx.entries +
                (fp -> e.copy(lastUsedMs = now))))
              e.sub
            }
        }
        hit match {
          case Some(sub) =>
            (spark.read.parquet(new Path(root, sub).toString), true)
          case None =>
            val sub = s"r_$fp"
            df.coalesce(1).write.mode("overwrite")
              .parquet(new Path(root, sub).toString) // outside the lock
            synchronized {
              misses += 1
              val idx = SidecarJson.read[Index](fs, idxPath)
                .getOrElse(Index(Map.empty))
              // LRU eviction beyond maxEntries (the new entry always stays)
              val entries = idx.entries + (fp -> Entry(sub, now))
              val evict = entries.toSeq.sortBy(_._2.lastUsedMs)
                .dropRight(maxEntries)
              evict.foreach { case (_, e) =>
                fs.delete(new Path(root, e.sub), true) }
              SidecarJson.write(fs, idxPath, Index(entries -- evict.map(_._1)))
            }
            (spark.read.parquet(new Path(root, sub).toString), false)
        }
    }
}
