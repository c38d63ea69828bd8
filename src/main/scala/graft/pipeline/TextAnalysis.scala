package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language identification (n-gram/stopword heuristic),
  * document fingerprinting. All pure column expressions — codegen'd,
  * shuffle-free, linear scans.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count estimate: whitespace tokens + intra-token case
    * and letter<->digit transitions (a regex approximation of byte-pair
    * tokenizers for budget estimation — deterministic, no vocab needed).
    * Expressed as transition COUNTS rather than lookaround splits: exactly
    * the same piece count (each in-token boundary adds one piece), but
    * RE2-expressible, so SQL oracles can mirror it.
    */
  def subwordCountEstimate(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(
        size(split(trim(text), "\\s+")) +
          regexp_count(text, lit("[a-z][A-Z]")) +
          regexp_count(text, lit("[a-zA-Z][0-9]")) +
          regexp_count(text, lit("[0-9][a-zA-Z]")))

  /** Quality-score components (length/punct/stopword ratios — the usual
    * heuristic filters in large-scale corpus cleaning).
    */
  def qualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nAlpha = length(regexp_replace(t, "[^a-zA-Z]", ""))
    val nPunct = length(regexp_replace(t, "[^.,;:!?'\"()]", ""))
    val nTok = tokenCount(t)
    docs
      .withColumn("n_chars", nChars)
      .withColumn("n_tokens", nTok)
      .withColumn("alpha_ratio", round(nAlpha.cast("double") / nChars, 6))
      .withColumn("punct_ratio", round(nPunct.cast("double") / nChars, 6))
      .withColumn("mean_word_len",
        round(nAlpha.cast("double") / greatest(nTok, lit(1)), 6))
  }

  /** Composite quality score in [0,1]: penalize too-short docs, extreme
    * punctuation, and unnatural mean word length.
    */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame =
    qualityFeatures(docs, textCol).withColumn("quality_score",
      round(
        least(col("n_tokens").cast("double") / 64.0, lit(1.0)) *
          (lit(1.0) - least(col("punct_ratio") * 4.0, lit(1.0)) * 0.5) *
          least(col("mean_word_len") / 4.0, lit(1.5)) / 1.5, 6))

  /** Tiny per-language stopword lists for the language-ID heuristic. */
  val StopWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es" -> Seq("el", "la", "los", "de", "que", "es", "en", "una", "por", "con"))

  /** Stopword hit count for one language over the normalized word array. */
  def stopwordHits(text: Column, lang: String): Column = {
    val w = Dedup.words(text)
    size(filter(w, t => t.isInCollection(StopWords(lang))))
  }

  /** Language-ID heuristic: argmax over per-language stopword hits; `und`
    * (undetermined) when no stopwords at all. Deterministic tie-break by
    * language code.
    */
  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val langs = StopWords.keys.toSeq.sorted
    val hits = langs.map(l => stopwordHits(col(textCol), l).as(s"hits_$l"))
    val withHits = docs.select(col("*") +: hits: _*)
    val best = langs.map(l => struct(col(s"hits_$l").as("h"), lit(l).as("l")))
      .reduce((a, b) => when(b.getField("h") > a.getField("h"), b).otherwise(a))
    withHits.withColumn("lang_pred",
      when(greatest(langs.map(l => col(s"hits_$l")): _*) === 0, lit("und"))
        .otherwise(best.getField("l")))
  }

  /** Content fingerprint: md5 of the normalized token stream (robust to
    * case/punctuation/whitespace changes).
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", Dedup.words(text)))

  /** Winnowing document sketch: k-char gram rolling hashes, keep the
    * per-window minimum; the distinct minima rows are the sketch — the
    * standard local fingerprinting scheme for near-dup detection at
    * character level.
    *
    * Row-wise on purpose: grams explode to rows and the window minimum is a
    * `Window.rowsBetween` — the nested-array form would re-evaluate the
    * normalization regex once per gram (Catalyst inlines single-reference
    * expressions into lambdas; O(n^2) per document).
    */
  def winnowing(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      k: Int = 8, window: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val norm = docs.select(col(idCol),
      concat_ws(" ", Dedup.words(col(textCol))).as("__norm"))
    // gram count is a pure function of the normalized length — carrying it
    // as a column avoids a second (unordered, full-buffer) window pass
    val grams = norm
      .select(col(idCol), col("__norm"),
        greatest(length(col("__norm")) - (k - 1), lit(1)).as("__n"),
        explode(sequence(lit(1), greatest(length(col("__norm")) - (k - 1), lit(1)))).as("__i"))
      .select(col(idCol), col("__i"), col("__n"),
        md5(col("__norm").substr(col("__i"), lit(k))).as("__h"))
    val wMin = Window.partitionBy(col(idCol)).orderBy(col("__i"))
      .rowsBetween(Window.currentRow, window - 1)
    grams
      .withColumn("__min", min(col("__h")).over(wMin))
      .filter(col("__i") - 1 <= greatest(col("__n") - window, lit(0)))
      .select(col(idCol), col("__min").as("h"))
      .distinct()
  }
}
