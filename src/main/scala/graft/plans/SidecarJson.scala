package graft.plans

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared read/write for the small JSON sidecar files the table layer keeps
  * next to data (`_bloom_config.json`, `_constraints.json`,
  * `_repl_state.json`, the results-cache `_index.json`): one place for the
  * charset, the stream hygiene, and the overwrite semantics, instead of a
  * copy per feature.
  */
private[plans] object SidecarJson {
  private implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats

  def read[T: Manifest](fs: FileSystem, p: Path): Option[T] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(org.json4s.jackson.Serialization.read[T](
        new String(org.apache.commons.io.IOUtils.toByteArray(in), UTF_8)))
      finally in.close()
    }

  def write(fs: FileSystem, p: Path, value: AnyRef): Unit = {
    val out = fs.create(p, true)
    try out.write(org.json4s.jackson.Serialization.write(value).getBytes(UTF_8))
    finally out.close()
  }
}
