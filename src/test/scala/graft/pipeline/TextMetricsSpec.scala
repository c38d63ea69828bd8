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

  test("bleu kernel == the aggregation form it replaced, on randomized pairs") {
    // the round-13 row-local kernel must be bit-identical to the original
    // explode + window + gram-join pipeline (exact long counts, StrictMath
    // float tail) — re-derive the old form inline and compare
    def oldBleu(pairs: org.apache.spark.sql.DataFrame, maxN: Int) = {
      import org.apache.spark.sql.expressions.Window
      def gramCountRows(df: org.apache.spark.sql.DataFrame, textCol: String, cnt: String) = {
        val win = Window.partitionBy(col("pair_id")).orderBy(col("__pos"))
        val toks = filter(Dedup.words(col(textCol)), t => length(t) > 0)
        val exploded = df.select(col("pair_id"), posexplode(toks).as(Seq("__pos", "__t")))
        val withLeads = (1 until maxN).foldLeft(exploded) { (d, o) =>
          d.withColumn(s"__l$o", lead(col("__t"), o).over(win))
        }
        val gramN = (1 to maxN).map { n =>
          val parts = col("__t") +: (1 until n).map(o => col(s"__l$o"))
          val ok = if (n == 1) lit(true) else col(s"__l${n - 1}").isNotNull
          when(ok, struct(lit(n).as("n"), concat_ws(" ", parts: _*).as("gram")))
        }
        withLeads.select(col("pair_id"), explode(array(gramN: _*)).as("g"))
          .filter(col("g").isNotNull)
          .groupBy(col("pair_id"), col("g.n").as("n"), col("g.gram").as("gram"))
          .agg(count(lit(1)).as(cnt))
      }
      def toks(c: org.apache.spark.sql.Column) = filter(Dedup.words(c), t => length(t) > 0)
      val candG = gramCountRows(pairs, "cand", "__c")
      val refG = gramCountRows(pairs, "ref", "__r")
      val perN = candG.join(refG, Seq("pair_id", "n", "gram"), "left")
        .groupBy(col("pair_id"), col("n"))
        .agg(sum(least(col("__c"), coalesce(col("__r"), lit(0L)))).as("__m"),
          sum(col("__c")).as("__t"))
      val pivotCols =
        (1 to maxN).map(n => sum(when(col("n") === n, col("__m"))).as(s"__m_$n")) ++
        (1 to maxN).map(n => sum(when(col("n") === n, col("__t"))).as(s"__t_$n"))
      val pivoted = perN.groupBy(col("pair_id")).agg(pivotCols.head, pivotCols.tail: _*)
      val lens = pairs.select(col("pair_id"),
        size(toks(col("cand"))).as("cand_len"), size(toks(col("ref"))).as("ref_len"))
      val allPos = (1 to maxN).map(n =>
        col(s"__m_$n") > 0 && col(s"__t_$n") > 0).reduce(_ && _)
      val logSum = (1 to maxN).map(n =>
        log(col(s"__m_$n").cast("double") / col(s"__t_$n"))).reduce(_ + _)
      val bp = when(col("cand_len") >= col("ref_len"), lit(1.0))
        .otherwise(exp(lit(1.0) - col("ref_len").cast("double") / col("cand_len")))
      lens.join(pivoted, Seq("pair_id"), "left")
        .select(col("pair_id"), col("cand_len"), col("ref_len"),
          when(col("cand_len") === 0, lit(0.0))
            .when(allPos, TextAnalysis.round6(bp * exp(logSum / maxN)))
            .otherwise(lit(0.0)).as("bleu"))
    }
    val rng = new scala.util.Random(13)
    val vocab = Seq("the", "cat", "sat", "on", "Mat!", "a", "b", "dog", "ran", "42")
    def text() = (0 until rng.nextInt(25)).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
    val rows = (1L to 60L).map(i => (i, text(), text()))
    for (maxN <- Seq(1, 2, 4)) {
      val df = pairsDF(rows: _*)
      val neu = TextAnalysis.bleuScore(df, maxN = maxN)
      val old = oldBleu(df, maxN)
      assert(neu.exceptAll(old).isEmpty && old.exceptAll(neu).isEmpty,
        s"kernel and aggregation BLEU diverge at maxN=$maxN")
    }
  }

  test("bleu: null cand/ref rows keep the aggregation form's -1 lengths and 0.0 score") {
    val df = Seq(
      (1L, null.asInstanceOf[String], "the cat"),
      (2L, "the cat", null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String], null.asInstanceOf[String]),
      (4L, "the cat", "the cat")).toDF("pair_id", "cand", "ref")
    val out = TextAnalysis.bleuScore(df, maxN = 2)
      .as[(Long, Int, Int, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, -1, 2, 0.0)))
    assert(out(2L) === ((2L, 2, -1, 0.0)))
    assert(out(3L) === ((3L, -1, -1, 0.0)))
    assert(out(4L) === ((4L, 2, 2, 1.0)))
  }

  test("bleu: tokenizer normalizes case and punctuation; empty candidate is 0") {
    val out = bleuOf(2,
      (1L, "The CAT, sat!", "the cat sat"),
      (2L, "???", "the cat sat"))
    assert(out(1L) === 1.0, "normalization must align both sides")
    assert(out(2L) === 0.0, "candidate normalizing to zero tokens scores 0")
  }
}
