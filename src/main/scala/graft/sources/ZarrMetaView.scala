package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** One-round-trip metadata view of a zarr store.
  *
  * Zarr v2 consolidated metadata (`.zmetadata`, written by
  * [[ZarrStore.write]] and by the reference, `spatialdata.py:1478-1492`)
  * indexes every `.zgroup`/`.zattrs`/`.zarray` JSON document under the
  * root. On a high-latency remote filesystem (s3a/abfs) serving the
  * layout from it turns O(elements x files) metadata round trips into ONE
  * read; locally it is just fewer syscalls. Data payloads (parquet
  * directories, chunk files) are NOT served here — they stay on the
  * task-parallel read path.
  *
  * [[ZarrMetaView.load]] returns a view backed by the consolidated
  * document when present and parseable, else a passthrough to per-file
  * reads — callers use one code path either way.
  */
private[sources] final class ZarrMetaView private (
    fs: FileSystem, root: String, index: Option[Map[String, JValue]]) {

  def isConsolidated: Boolean = index.isDefined

  private def readFile(rel: String): String = {
    val in = fs.open(new Path(s"$root/$rel"))
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** JSON text of the metadata file at store-relative `rel`, if present. */
  def text(rel: String): Option[String] = index match {
    case Some(m) => m.get(rel).map(v => JsonMethods.compact(JsonMethods.render(v)))
    case None =>
      if (fs.exists(new Path(s"$root/$rel"))) Some(readFile(rel)) else None
  }

  def textOrFail(rel: String): String =
    text(rel).getOrElse(sys.error(s"zarr metadata missing: $rel"))

  /** Does a metadata file exist at `rel`? */
  def hasMeta(rel: String): Boolean = index match {
    case Some(m) => m.contains(rel)
    case None => fs.exists(new Path(s"$root/$rel"))
  }

  /** Immediate child directories of `prefix` that carry metadata (the
    * element names of a kind group) — from the index when consolidated
    * (no listing round trip), else a directory listing.
    */
  def childDirs(prefix: String): Seq[String] = index match {
    case Some(m) =>
      val p = s"$prefix/"
      m.keysIterator.collect {
        case k if k.startsWith(p) && k.stripPrefix(p).contains('/') =>
          k.stripPrefix(p).takeWhile(_ != '/')
      }.toSeq.distinct.sorted
    case None =>
      val d = new Path(s"$root/$prefix")
      if (!fs.exists(d)) Nil
      else fs.listStatus(d).toSeq
        .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
        .map(_.getPath.getName).sorted
  }
}

private[sources] object ZarrMetaView {

  /** Load the store's metadata view; an absent or unparseable
    * `.zmetadata` silently degrades to per-file reads (matching the
    * reference, which treats consolidated metadata as an optimization,
    * never a requirement).
    */
  def load(fs: FileSystem, root: String): ZarrMetaView = {
    val zm = new Path(s"$root/.zmetadata")
    val index =
      try {
        if (!fs.exists(zm)) None
        else {
          val in = fs.open(zm)
          val text =
            try {
              val bos = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](8192)
              var n = in.read(buf)
              while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
              new String(bos.toByteArray, "UTF-8")
            } finally in.close()
          JsonMethods.parse(text) \ "metadata" match {
            case JObject(fields) => Some(fields.toMap)
            case _ => None
          }
        }
      } catch { case _: Exception => None }
    new ZarrMetaView(fs, root, index)
  }
}
