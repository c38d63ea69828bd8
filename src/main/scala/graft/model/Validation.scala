package graft.model

/** Name/key validation rules (reference `_core/validation.py:83-260`). */
object Validation {

  /** Reject invalid element/coordinate-system/column names:
    * empty, ".", "..", path separators, or a "__" prefix
    * (validation.py:83-115).
    */
  def validateName(name: String): Unit = {
    require(name.nonEmpty, "name must not be empty")
    require(name != "." && name != "..", s"invalid name '$name'")
    require(!name.contains("/") && !name.contains("\\"),
      s"name '$name' must not contain path separators")
    require(!name.startsWith("__"), s"name '$name' must not start with '__'")
  }

  /** Case-insensitive global uniqueness across the container
    * (validation.py:116-160).
    */
  def validateUniqueNames(names: Seq[String]): Unit = {
    val dups = names.groupBy(_.toLowerCase).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"element names must be case-insensitively unique; duplicates: ${dups.mkString(", ")}")
  }

  /** Replace forbidden characters so an arbitrary string becomes a valid
    * element name (reference `_core/_utils.py:34-91` sanitize_name):
    * non-alphanumeric characters outside `_-.` become `_`, a `__` prefix
    * sheds one underscore at a time, and for dataframe columns the reserved
    * `_index` maps to `index`.
    */
  def sanitizeName(raw: String, isDataframeColumn: Boolean = false): String = {
    if (raw.isEmpty || raw == "." || raw == "..") return "unnamed"
    var s = raw.map(c =>
      if (Character.isLetterOrDigit(c) || c == '_' || c == '-' || c == '.') c else '_')
    while (s.startsWith("__")) s = s.drop(1)
    if (isDataframeColumn && s == "_index") "index"
    else if (s.isEmpty) "unnamed"
    else s
  }

  /** Sanitize every key of a table element — obs columns, obsm keys, layer
    * names — through [[sanitizeName]] while keeping case-insensitive
    * uniqueness with `_N` counters (reference `sanitize_table`,
    * `_core/_utils.py:93-166`). Pure rename: no data movement, the plan
    * gains projections only.
    */
  def sanitizeTable(el: SpatialElement): SpatialElement = {
    require(el.meta.kind == ElementKind.Tables, "sanitizeTable expects a table element")
    def uniquifier(isDataframeColumn: Boolean = false): String => String = {
      val used = scala.collection.mutable.Set[String]()
      raw => {
        val base = sanitizeName(raw, isDataframeColumn)
        val name =
          if (!used.contains(base.toLowerCase)) base
          else {
            var c = 1
            while (used.contains(s"${base}_$c".toLowerCase)) c += 1
            s"${base}_$c"
          }
        used += name.toLowerCase
        name
      }
    }
    val obsNamer = uniquifier(isDataframeColumn = true)
    // rename POSITIONALLY (one namer call per occurrence): duplicate source
    // column names are legal in Spark and must land on distinct outputs,
    // which a name-keyed map would collapse
    val newNames = el.obs.columns.map(obsNamer)
    val newObs = el.obs.toDF(newNames.toIndexedSeq: _*)
    // the annotation linkage names obs columns — remap it through the same
    // renamer (first occurrence wins, like column resolution), or a
    // sanitized/uniquified region/instance key silently breaks every join
    // that resolves through meta.table
    val obsRename: Map[String, String] =
      el.obs.columns.zip(newNames).reverse.toMap
    val newTable = el.meta.table.map(t => t.copy(
      regionKey = obsRename.getOrElse(t.regionKey, t.regionKey),
      instanceKey = obsRename.getOrElse(t.instanceKey, t.instanceKey)))
    val obsmNamer = uniquifier()
    val layerNamer = uniquifier()
    val newAux = el.aux.map {
      case (k, df) if k.startsWith("obsm:") =>
        val old = k.stripPrefix("obsm:")
        val clean = obsmNamer(old)
        // the wide frame's <key>_j columns carry the obsm key — keep in sync
        val renamed = df.toDF(df.columns.map(c =>
          if (c.startsWith(s"${old}_")) s"${clean}_${c.stripPrefix(s"${old}_")}" else c)
          .toIndexedSeq: _*)
        s"obsm:$clean" -> renamed
      case (k, df) if k.startsWith("layer:") =>
        s"layer:${layerNamer(k.stripPrefix("layer:"))}" -> df
      case other => other
    }
    el.copy(meta = el.meta.copy(table = newTable), data = newObs, aux = newAux)
  }
}
