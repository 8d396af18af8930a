package graft.plans

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Versioned compare-and-swap JSON document store — the durable-state
  * discipline every metastore stand-in in this library shares (the
  * [[NamedTables]] catalog, [[Authz]] database, [[Workload]] resource
  * plans, [[ScheduledQueries]] registry; ref standalone-metastore/src/main/
  * thrift/hive_metastore.thrift — all of these are metastore tables in the
  * reference). The full document is one `v%08d.json` per change, published
  * create-exclusive exactly like a [[Snapshots]] manifest: concurrent
  * writer JVMs CAS on the version number and the loser replays its
  * mutation against the fresh state, so no change is lost. Documents are
  * tiny (rows of names/grants/plans), so whole-doc-per-version costs
  * nothing and keeps recovery a single-file read.
  *
  * Scope: ONE catalog per JVM, like the metastore connection it stands in
  * for — every registry ([[NamedTables]], [[Authz]], [[Workload]],
  * [[ScheduledQueries]]) bootstraps its store from the first session's
  * `spark.graft.catalog` and is JVM-global thereafter. Hosting sessions
  * with DIFFERENT catalog dirs in one JVM is out of scope (they would
  * share registries), exactly as two metastores in one HiveServer2 are.
  */
private[plans] final class CasJsonStore[T](
    dir: Path,
    conf: Configuration,
    empty: T,
    encode: T => String,
    decode: String => T) {

  private val fs = dir.getFileSystem(conf)

  private def versionPath(v: Long) = new Path(dir, f"v$v%08d.json")

  private def versions(): Seq[Long] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(_.stripPrefix("v").stripSuffix(".json").toLong).sorted

  /** (latest version, its document); (-1, empty) for a fresh store. */
  def load(): (Long, T) = versions().lastOption match {
    case None => (-1L, empty)
    case Some(v) =>
      val in = fs.open(versionPath(v))
      val txt = try {
        val bs = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bs, 8192, false)
        bs.toString("UTF-8")
      } finally in.close()
      (v, decode(txt))
  }

  /** CAS publish of version `v` — create-exclusive, false on conflict.
    * Versions must be strictly increasing over the CURRENT listing: a
    * writer stalled long enough for its target version to be published
    * AND pruned by others would otherwise re-create the deleted file,
    * "win", and have its mutation silently shadowed by the newer latest
    * (readers take lastOption). The newest version is never pruned, so
    * the listing always witnesses any number that was ever taken.
    */
  private def publish(v: Long, doc: T): Boolean = {
    fs.mkdirs(dir)
    if (versions().lastOption.exists(_ >= v)) return false
    val dst = versionPath(v)
    if (fs.exists(dst)) return false
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID().toString}")
    val out = fs.create(tmp, false)
    try out.write(encode(doc).getBytes("UTF-8")) finally out.close()
    val ok =
      if (dst.toUri.getScheme == null || dst.toUri.getScheme == "file") {
        // local FS: hard-link is the atomic create-exclusive publish
        val lp = java.nio.file.Paths.get(dst.toUri.getPath)
        val tp = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath)
        try { java.nio.file.Files.createLink(lp, tp); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else {
        try {
          org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
            .rename(fs.makeQualified(tmp), fs.makeQualified(dst))
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        }
      }
    fs.delete(tmp, false)
    ok
  }

  /** Apply `op` to the durable document, CAS-retrying against fresh state. */
  def mutate(op: T => T): Unit = {
    var done = false
    var tries = 0
    while (!done) {
      val (v, cur) = load()
      val next = op(cur)
      done = (next == cur) || publish(v + 1, next)
      if (done && next != cur) prune(v + 1)
      tries += 1
      require(tries <= 50, s"CAS did not converge at $dir")
    }
  }

  /** Retire old versions after a successful publish — a hot mutation path
    * (scheduled-query lastRunAt per tick) would otherwise grow the
    * directory one file per change forever, and every load() lists it
    * all. Readers always pick the LATEST version, so keeping a window of
    * trailing versions covers any in-flight load, and [[publish]]'s
    * strictly-increasing check keeps pruned numbers from ever being
    * recycled; deletes are best-effort.
    */
  private val keepVersions = 20
  private def prune(latest: Long): Unit =
    versions().filter(_ <= latest - keepVersions).foreach { v =>
      try fs.delete(versionPath(v), false) catch { case _: Exception => () }
    }
}
