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
}
