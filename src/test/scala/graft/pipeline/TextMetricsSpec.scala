package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-10 (continued) text-pair metrics: BLEU with reference clipping. */
class TextMetricsSpec extends SparkTestBase {
  import spark.implicits._

  private def pairsDF(rows: (Long, String, String)*) =
    rows.toDF("pair_id", "cand", "ref")

  private def bleuOf(maxN: Int, rows: (Long, String, String)*): Map[Long, Double] =
    TextAnalysis.bleuScore(pairsDF(rows: _*), maxN = maxN)
      .select("pair_id", "bleu").as[(Long, Double)].collect().toMap

  test("bleu: identical texts score 1, disjoint texts score 0") {
    val out = bleuOf(4,
      (1L, "the cat sat on the mat today", "the cat sat on the mat today"),
      (2L, "alpha beta gamma delta epsilon", "one two three four five"))
    assert(out(1L) === 1.0)
    assert(out(2L) === 0.0)
  }

  test("bleu: reference clipping caps repeated candidate grams") {
    // cand 'the' x4 vs ref with ONE 'the': clipped unigram precision 1/4
    val out = bleuOf(1, (1L, "the the the the", "the cat"))
    assert(out(1L) === 0.25)
  }

  test("bleu: brevity penalty exp(1 - ref/cand) for short candidates") {
    // perfect 1- and 2-gram precision, cand half the reference length:
    // bleu = exp(1 - 6/3) = exp(-1), 6-dec snapped
    val out = bleuOf(2, (1L, "the cat sat", "the cat sat on the mat"))
    assert(out(1L) === 0.367879)
  }

  test("bleu: any zero n-gram precision zeroes the unsmoothed score") {
    // 3-word candidate has no 4-grams -> p4 undefined -> 0 under maxN=4
    val out = bleuOf(4, (1L, "the cat sat", "the cat sat on the mat"))
    assert(out(1L) === 0.0)
  }

  test("bleu: tokenizer normalizes case and punctuation; empty candidate is 0") {
    val out = bleuOf(2,
      (1L, "The CAT, sat!", "the cat sat"),
      (2L, "???", "the cat sat"))
    assert(out(1L) === 1.0, "normalization must align both sides")
    assert(out(2L) === 0.0, "candidate normalizing to zero tokens scores 0")
  }
}
