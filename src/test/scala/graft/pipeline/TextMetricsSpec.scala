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

  test("rougeN: hand overlap, one-sided grams NULL the missing ratio, F1 law") {
    // cand "a b c", ref "a b d": unigram m=2, tc=3, tr=3 -> r=p=f1=2/3;
    // bigram: cand {a b, b c}, ref {a b, b d}: m=1 -> 1/2 each
    val out = TextAnalysis.rougeN(pairsDF((1L, "a b c", "a b d")), maxN = 2)
      .orderBy("n")
      .select("n", "rouge_recall", "rouge_precision", "rouge_f1")
      .as[(Int, Option[Double], Option[Double], Option[Double])].collect().toSeq
    assert(out === Seq(
      (1, Some(0.666667), Some(0.666667), Some(0.666667)),
      (2, Some(0.5), Some(0.5), Some(0.5))))
    // 1-word candidate: no bigrams -> n=2 row has NULL precision/f1 but
    // real recall denominator from the reference side
    val short = TextAnalysis.rougeN(pairsDF((1L, "a", "a b c")), maxN = 2)
      .orderBy("n")
      .select("n", "rouge_recall", "rouge_precision", "rouge_f1")
      .as[(Int, Option[Double], Option[Double], Option[Double])].collect().toSeq
    assert(short(0) === ((1, Some(0.333333), Some(1.0), Some(0.5))))
    assert(short(1) === ((2, Some(0.0), None, None)))
    // clipping: repeated candidate gram credits at most its ref count
    val clip = TextAnalysis.rougeN(pairsDF((1L, "a a a a", "a b")), maxN = 1)
      .select("rouge_recall", "rouge_precision")
      .as[(Double, Double)].collect().head
    assert(clip === ((0.5, 0.25)))
  }

  test("bleu: tokenizer normalizes case and punctuation; empty candidate is 0") {
    val out = bleuOf(2,
      (1L, "The CAT, sat!", "the cat sat"),
      (2L, "???", "the cat sat"))
    assert(out(1L) === 1.0, "normalization must align both sides")
    assert(out(2L) === 0.0, "candidate normalizing to zero tokens scores 0")
  }
}
