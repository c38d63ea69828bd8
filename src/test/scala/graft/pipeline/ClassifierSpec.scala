package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  // linearly separable: label = x > 0
  private lazy val toy = (-50 until 50).map(i =>
    (i.toLong, i / 10.0, if (i >= 0) 1.0 else 0.0)).toDF("doc_id", "x", "y")

  test("logisticTrain learns a positive slope on separable data; trace is deterministic") {
    val w = Classifier.logisticTrain(toy, Seq("x"), "y", iters = 5, lr = 1.0)
      .orderBy("feature_idx").collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(w("x") > 0.0, s"slope must be positive: $w")
    val w2 = Classifier.logisticTrain(toy, Seq("x"), "y", iters = 5, lr = 1.0)
      .orderBy("feature_idx").collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(w === w2, "training must be bit-for-bit reproducible")
  }

  test("logisticScore is monotone in the learned direction and separates the classes") {
    val wts = Classifier.logisticTrain(toy, Seq("x"), "y", iters = 10, lr = 2.0)
      .orderBy("feature_idx").collect()
      .map(r => (r.getString(1), r.getDouble(2))).toSeq
    val scores = Classifier.logisticScore(toy, wts)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // scores ordered by x must be non-decreasing (positive slope)
    val ordered = (-50 until 50).map(i => scores(i.toLong))
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b },
      "sigmoid of a positive-slope model must be monotone in x")
    // mean score of positives above mean of negatives
    val (pos, neg) = ((0 until 50).map(i => scores(i.toLong)),
      (-50 until 0).map(i => scores(i.toLong)))
    assert(pos.sum / pos.size > neg.sum / neg.size + 0.1)
  }

  test("gradient pass is one aggregation job over executors (no per-row collect)") {
    // structural sanity: the training frame plan has no corpus-wide window
    // and training leaves no cached frame behind
    val before = spark.sparkContext.getPersistentRDDs.size
    Classifier.logisticTrain(toy, Seq("x"), "y", iters = 2).collect()
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "training must unpersist its feature cache")
  }

  test("wilsonInterval: hand formula, clamping, and n=0 NULL law") {
    import spark.implicits._
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val df = Seq(("a", 8L, 10L), ("b", 0L, 5L), ("c", 5L, 5L), ("d", 0L, 0L))
      .toDF("k", "hits", "n")
    val got = Classifier.wilsonInterval(df, "hits", "n")
      .select("k", "p_hat", "ci_lo", "ci_hi")
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val z = 1.959964; val z2 = z * z
    def wilson(h: Long, n: Long): (Double, Double) = {
      val nd = n.toDouble; val p = h.toDouble / nd
      val denom = 1.0 + z2 / nd
      val c = (p + z2 / (2.0 * nd)) / denom
      val hw = z * math.sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd)) / denom
      (r6(math.max(0.0, c - hw)), r6(math.min(1.0, c + hw)))
    }
    val (loA, hiA) = wilson(8, 10)
    assert(got("a") === ((Some(0.8), Some(loA), Some(hiA))))
    // p=0 and p=1 clamp to the [0,1] ends
    assert(got("b")._2.get === 0.0 && got("c")._3.get === 1.0)
    assert(got("b")._3.get > 0.0 && got("c")._2.get < 1.0)
    assert(got("d") === ((None, None, None)))
  }

  test("classBalanceWeights: uniform classes all 1.0; rare classes weigh more; beta->1 approaches inverse frequency") {
    import spark.implicits._
    val uniform = (1 to 30).map(i => (i.toLong, s"c${i % 3}")).toDF("id", "cls")
    val u = Classifier.classBalanceWeights(uniform, "cls")
      .select("weight").as[Double].collect().toSeq
    assert(u === Seq(1.0, 1.0, 1.0))
    // 90/9/1 split: weights must order inversely to counts and sum to C
    val skew = ((1 to 90).map(i => (i.toLong, "big")) ++
      (1 to 9).map(i => (100L + i, "mid")) ++ Seq((200L, "rare")))
      .toDF("id", "cls")
    val w = Classifier.classBalanceWeights(skew, "cls")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(w("rare") > w("mid") && w("mid") > w("big"))
    assert(math.abs(w.values.sum - 3.0) < 1e-4, s"weights must sum to C: $w")
    // beta -> 1: ratios approach inverse frequency (rare/big ~ 90/1)
    val w9 = Classifier.classBalanceWeights(skew, "cls", beta = 0.99999)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(w9("rare") / w9("big") > 50.0,
      s"near-1 beta must approach inverse frequency: $w9")
  }

  test("targetEncodeLoo: LOO category mean, singleton/NULL fall back to global LOO") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), 10.0), (2L, Some("a"), 20.0), (3L, Some("a"), 30.0),
      (4L, Some("b"), 100.0),           // singleton category
      (5L, None: Option[String], 40.0)  // NULL category
    ).toDF("id", "cat", "y")
    val got = Classifier.targetEncodeLoo(df, "cat", "y")
      .select("id", "te").as[(Long, Option[Double])]
      .collect().map(r => r._1 -> r._2).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got(1L) === Some(r6((20.0 + 30.0) / 2)))     // excludes own 10
    assert(got(2L) === Some(r6((10.0 + 30.0) / 2)))
    assert(got(3L) === Some(r6((10.0 + 20.0) / 2)))
    // global sum=200, N=5: singleton b -> (200-100)/4; NULL -> (200-40)/4
    assert(got(4L) === Some(r6(100.0 / 4)))
    assert(got(5L) === Some(r6(160.0 / 4)))
    // degenerate 1-row frame -> NULL (no other row to borrow from)
    val one = Seq((1L, Some("z"), 7.0)).toDF("id", "cat", "y")
    val g1 = Classifier.targetEncodeLoo(one, "cat", "y")
      .select("te").as[Option[Double]].collect().toSeq
    assert(g1 === Seq(None))
  }

  test("nmi: identical partitions 1, independent 0, constant side NULL") {
    def run(rows: Seq[(String, String)]): (Double, Double, Double, Option[Double]) =
      Classifier.nmi(rows.toDF("a", "b"), "a", "b")
        .select("mi", "h_a", "h_b", "nmi")
        .as[(Double, Double, Double, Option[Double])].collect().head
    // identical 2-way partitions: mi = h = 2*round6(0.5 ln 2), nmi = 1
    val same = run(Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q")))
    assert(same._4 === Some(1.0))
    assert(same._1 === same._2 && same._2 === same._3)
    // independent uniform 2x2: every cell ln(1) = 0 -> mi 0, nmi 0
    val ind = run(Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")))
    assert(ind._1 === 0.0 && ind._4 === Some(0.0))
    // one side constant: its entropy is +0.0 (snap normalizes -0.0) and
    // the normalization is undefined -> NULL
    val const = run(Seq(("x", "p"), ("x", "q"), ("x", "p")))
    assert(const._2 === 0.0)
    assert(const._2.compareTo(0.0) == 0, "entropy of a constant side must be +0.0, not -0.0")
    assert(const._4 === None)
  }

  test("pairwiseClusterAgreement: hand pair confusion, ARI/FM laws, trivial-partition convention") {
    def run(rows: Seq[(String, String)]) =
      Classifier.pairwiseClusterAgreement(rows.toDF("a", "b"), "a", "b")
        .select("n", "tp", "fp", "fn", "tn", "ari", "fowlkes_mallows")
        .as[(Long, Long, Long, Long, Long, Option[Double], Option[Double])]
        .collect().head
    // identical 2-way partitions: perfect agreement
    assert(run(Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))) ===
      ((4L, 2L, 0L, 0L, 4L, Some(1.0), Some(1.0))))
    // hand-derived mixed case (3+3 vs 3+3 with one swap each way)
    assert(run(Seq(("x", "p"), ("x", "p"), ("x", "q"),
        ("y", "q"), ("y", "q"), ("y", "p"))) ===
      ((6L, 2L, 4L, 4L, 5L, Some(-0.111111), Some(0.333333))))
    // uniform independent 2x2 at n=4: exact pair algebra gives -0.5
    // (chance-corrected to 0 only in expectation, not per arrangement)
    assert(run(Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))) ===
      ((4L, 0L, 2L, 2L, 2L, Some(-0.5), Some(0.0))))
    // both partitions trivial and identical: zero denominator but
    // fp = fn = 0 -> the 1.0 convention
    assert(run(Seq(("x", "p"), ("x", "p"), ("x", "p"))) ===
      ((3L, 3L, 0L, 0L, 0L, Some(1.0), Some(1.0))))
  }
}
