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
    * element name (reference `_core/_utils.py` sanitize_name).
    */
  def sanitizeName(raw: String): String = {
    val cleaned = raw.map(c => if (c == '/' || c == '\\') '_' else c)
    val noPrefix = if (cleaned.startsWith("__")) cleaned.drop(2) else cleaned
    if (noPrefix.isEmpty || noPrefix == "." || noPrefix == "..") "unnamed" else noPrefix
  }

  /** Sanitize every key of a table element — obs columns, obsm keys, layer
    * names — through [[sanitizeName]] while keeping case-insensitive
    * uniqueness with `_N` counters (reference `sanitize_table`,
    * `_core/_utils.py:93-166`). Pure rename: no data movement, the plan
    * gains projections only.
    */
  def sanitizeTable(el: SpatialElement): SpatialElement = {
    require(el.meta.kind == ElementKind.Tables, "sanitizeTable expects a table element")
    def uniquifier(): String => String = {
      val used = scala.collection.mutable.Set[String]()
      raw => {
        val base = sanitizeName(raw)
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
    val obsNamer = uniquifier()
    val newObs = el.obs.toDF(el.obs.columns.map(obsNamer).toIndexedSeq: _*)
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
    el.copy(data = newObs, aux = newAux)
  }
}
