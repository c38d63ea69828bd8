package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins [[TextKernel]] (single-pass StaticInvoke sketches) bit-identical to
  * the composed-expression forms it replaced — the DuckDB oracles for q42
  * and q52 still describe the expression forms, so equivalence here is what
  * keeps those gates meaningful.
  */
class TextKernelSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog"),
    (2L, ""),
    (3L, "a"),
    (4L, "ab"),
    (5L, "exactly8"),
    (6L, "two words"),
    (7L, "Punctuation, CASE; and 123 digits!"),
    (8L, ("repeat me " * 40).trim),
    (9L, "x" * 7), // one char short of a full gram
    (10L, "y" * 8) // exactly one gram
  ).toDF("doc_id", "text")

  private def legacyWinnowing(k: Int, window: Int) = {
    val norm = docs.select(col("doc_id"),
      concat_ws(" ", Dedup.words(col("text"))).as("__norm"))
    val hashed = norm.select(col("doc_id"),
      transform(
        sequence(lit(1), greatest(length(col("__norm")) - (k - 1), lit(1))),
        i => md5(col("__norm").substr(i, lit(k)))).as("__gh"))
    hashed
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(0), greatest(size(col("__gh")) - window, lit(0))),
          w => array_min(slice(col("__gh"), w + 1, lit(window)))))).as("h"))
      .distinct()
  }

  test("winnowing kernel == expression form (k=8 w=4 and k=5 w=3)") {
    for ((k, w) <- Seq((8, 4), (5, 3))) {
      val got = TextAnalysis.winnowing(docs, k = k, window = w)
        .orderBy("doc_id", "h").collect().map(r => (r.getLong(0), r.getString(1)))
      val want = legacyWinnowing(k, w)
        .orderBy("doc_id", "h").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq == want.toSeq, s"k=$k window=$w")
    }
  }

  test("minhashRow kernel == (w1 + j*w2) mod 2^32 expression form") {
    val numHashes = 12
    val sh = Dedup.shingleRows(docs, "text", "doc_id", 3)
    // the double-hashing family over md5 hex substrings, in plain
    // expressions (the exact SQL the oracles mirror)
    def word(off: Int) =
      conv(substring(md5(col("shingle")), off, 8), 16, 10).cast("long")
    val legacyAggs = (0 until numHashes).map { j =>
      min((word(1) + lit(j.toLong) * word(9)) % 4294967296L).as(s"mh$j")
    }
    val want = sh.groupBy(col("doc_id")).agg(legacyAggs.head, legacyAggs.tail: _*)
      .orderBy("doc_id").collect().map(_.toSeq)
    val got = Dedup.minhashSignatures(docs, "text", "doc_id", 3, numHashes)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("distinctShingles kernel == distinct of the window-lead row form") {
    for (k <- Seq(2, 3, 5)) {
      val got = docs
        .select(col("doc_id"),
          explode(Dedup.distinctShingleArray(col("text"), k)).as("shingle"))
        .orderBy("doc_id", "shingle").as[(Long, String)].collect().toSeq
      val want = Dedup.shingleRows(docs, "text", "doc_id", k).distinct()
        .orderBy("doc_id", "shingle").as[(Long, String)].collect().toSeq
      assert(got == want, s"k=$k")
    }
  }

  test("minhash signatures are a shuffle-free projection over the scan") {
    val plan = Dedup.minhashSignatures(docs, "text", "doc_id", 3, 12)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window"),
      s"minhashDoc path must not shuffle or sort:\n$plan")
  }

  private def legacyRepetitionSignals(docs: org.apache.spark.sql.DataFrame) = {
    import TextAnalysis.round6
    val base = docs.select(col("doc_id"),
      length(concat_ws(" ", Dedup.words(col("text")))).as("__norm_len"))
    val lineCounts = docs
      .select(col("doc_id"), explode(filter(
        transform(split(col("text"), "\n"), l => trim(l)),
        l => length(l) > 0)).as("__line"))
      .groupBy(col("doc_id"), col("__line"))
      .agg(count(lit(1)).as("__c"))
    val lineAgg = lineCounts.groupBy(col("doc_id")).agg(
      ((sum(col("__c")) - count(lit(1))).cast("double") / sum(col("__c")))
        .as("dup_line_frac"),
      (sum((col("__c") - 1) * length(col("__line"))).cast("double") /
        sum(col("__c") * length(col("__line")))).as("dup_line_char_frac"))
    val g2 = Dedup.shingleRows(docs, "text", "doc_id", 2)
      .groupBy(col("doc_id"), col("shingle")).agg(count(lit(1)).as("__c"))
    val topG2 = g2.groupBy(col("doc_id")).agg(
      max(struct(col("__c"), col("shingle"))).as("__top"))
      .select(col("doc_id"),
        (col("__top.__c") * length(col("__top.shingle"))).as("__top_chars"))
    val g5 = Dedup.shingleRows(docs, "text", "doc_id", 5)
      .groupBy(col("doc_id"), col("shingle")).agg(count(lit(1)).as("__c"))
    val dup5 = g5.groupBy(col("doc_id")).agg(
      (sum(when(col("__c") > 1, col("__c")).otherwise(0)).cast("double") /
        sum(col("__c"))).as("dup_5gram_frac"))
    base
      .join(lineAgg, Seq("doc_id"), "left")
      .join(topG2, Seq("doc_id"), "left")
      .join(dup5, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round6(coalesce(col("dup_line_frac"), lit(0.0))).as("dup_line_frac"),
        round6(coalesce(col("dup_line_char_frac"), lit(0.0))).as("dup_line_char_frac"),
        round6(coalesce(col("__top_chars").cast("double") /
          greatest(col("__norm_len"), lit(1)), lit(0.0))).as("top_2gram_char_frac"),
        round6(coalesce(col("dup_5gram_frac"), lit(0.0))).as("dup_5gram_frac"))
  }

  test("repetitionSignals kernel == the aggregate form (incl. line and gram edges)") {
    val reps = Seq(
      (21L, "dup line\ndup line\nunique\n\n  \nx y x y x y x y x y"),
      (22L, "a b c d e a b c d e a b c d e a b c d e a b c d e"),
      (23L, "no newlines just words here"),
      (24L, ""),
      (25L, "one\ntwo\nthree"),
      (26L, "  padded line  \n  padded line  \ntail")
    ).toDF("doc_id", "text")
    val all = docs.unionByName(reps)
    val got = TextAnalysis.repetitionSignals(all)
      .orderBy("doc_id").collect().map(_.toSeq)
    val want = legacyRepetitionSignals(all)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("repetitionSignals is a shuffle-free projection") {
    val plan = TextAnalysis.repetitionSignals(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window"),
      s"repetition signals must not shuffle:\n$plan")
  }

  test("empty document sketches to md5 of the empty string") {
    val one = Seq((1L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.winnowing(one).collect()
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("d41d8cd98f00b204e9800998ecf8427e"))
  }
}
