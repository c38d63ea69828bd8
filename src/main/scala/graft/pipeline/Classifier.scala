package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training of a linear quality classifier — the
  * fastText-style model gate (CCNet / RedPajama / FineWeb pipelines score
  * documents with a small trained classifier, not just hand rules). Full-
  * batch logistic regression: the corpus never leaves executors; each
  * iteration is ONE aggregation job (k+1 gradient sums + the row count,
  * partial map-side), and the weight vector — the model, k+1 doubles — is
  * the only thing the driver ever holds, exactly like k-means centroids.
  *
  * Determinism contract (same conventions as [[Similarity.kmeansTrain]]):
  * features are 6-decimal-snapped on entry; the sigmoid is snapped to the
  * 6-decimal grid BEFORE the gradient product; per-row gradient terms are
  * snapped and then summed in exact DECIMAL(28,6) (fold-order-free); the
  * weight update runs the identical IEEE expression driver-side. The whole
  * training trace is therefore reproducible bit-for-bit on any engine —
  * and oracle-mirrorable as unrolled SQL.
  */
object Classifier {

  private def round6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Train logistic-regression weights over `featureCols` (+ an implicit
    * bias term) against the 0/1 `labelCol`. Full-batch gradient descent:
    * w_j <- round6(w_j - lr * g_j / n) with
    * g_j = Σ_rows round6((σ(w·x) - y) * x_j) summed in exact decimal.
    * Output: (feature_idx, feature, weight), bias last.
    */
  def logisticTrain(df: DataFrame, featureCols: Seq[String], labelCol: String,
      iters: Int = 2, lr: Double = 1.0): DataFrame = {
    require(iters >= 1, s"logisticTrain: iters must be >= 1, got $iters")
    require(featureCols.nonEmpty, "logisticTrain: need at least one feature")
    val spark = df.sparkSession
    import spark.implicits._
    val feats = df.select(
      featureCols.map(c => TextAnalysis.round6(col(c).cast("double")).as(c)) ++
        Seq(lit(1.0).as("__bias"), col(labelCol).cast("double").as("__y")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val names = featureCols :+ "__bias"
    try {
      var w = Array.fill(names.size)(0.0)
      for (_ <- 1 to iters) {
        val z = names.zipWithIndex
          .map { case (c, j) => col(c) * lit(w(j)) }
          .reduceLeft(_ + _) // fixed left-to-right fold — mirrored in SQL
        val sigma = TextAnalysis.round6(lit(1.0) / (lit(1.0) + exp(-z)))
        val gradCols = names.zipWithIndex.map { case (c, j) =>
          sum(TextAnalysis.round6((sigma - col("__y")) * col(c))
            .cast("decimal(28,6)")).cast("double").as(s"__g$j")
        }
        val row = feats.agg(count(lit(1)).as("__n"), gradCols: _*).collect()(0)
        val n = row.getLong(0)
        require(n > 0, "logisticTrain: empty training frame")
        w = w.indices.map(j =>
          round6d(w(j) - lr * row.getDouble(j + 1) / n)).toArray
      }
      names.zipWithIndex
        .map { case (c, j) => (j.toLong, c, w(j)) }
        .toDF("feature_idx", "feature", "weight")
    } finally feats.unpersist(blocking = false)
  }

  /** Apply trained weights: per-row 6-decimal-snapped sigmoid score — a
    * stateless codegen'd projection (the inference half; weights are
    * literals, no join). `weights` must cover every feature plus
    * `__bias`, in the training order.
    */
  def logisticScore(df: DataFrame, weights: Seq[(String, Double)],
      idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty, "logisticScore: empty weight vector")
    val z = weights.map { case (c, wj) =>
      (if (c == "__bias") lit(1.0)
       else TextAnalysis.round6(col(c).cast("double"))) * lit(wj)
    }.reduceLeft(_ + _)
    df.select(col(idCol),
      TextAnalysis.round6(lit(1.0) / (lit(1.0) + exp(-z))).as("score"))
  }

  /** MULTI-CLASS confusion matrix: (actual, predicted, n) counts — the
    * raw table behind every language-ID / domain-router / tier-labeler
    * audit. One keyed aggregation; absent combinations are absent rows.
    */
  def confusionMatrix(df: DataFrame, actualCol: String,
      predictedCol: String): DataFrame =
    df.groupBy(col(actualCol).cast("string").as("actual"),
        col(predictedCol).cast("string").as("predicted"))
      .agg(count(lit(1)).as("n"))

  /** Per-class precision / recall / F1 from the confusion counts — the
    * multi-class audit table (macro-averaging is one AVG over it). All
    * arithmetic runs on the aggregated matrix (|classes|² rows at most),
    * never the corpus; a class that is never predicted has NULL
    * precision (not 0 — "no predictions" and "all wrong" must not
    * collide), a class absent from `actual` has NULL recall. The class
    * universe is the union of actual and predicted labels.
    * Output: (clazz, support, n_predicted, tp, precision, recall, f1).
    */
  def classMetrics(df: DataFrame, actualCol: String,
      predictedCol: String): DataFrame = {
    val cm = confusionMatrix(df, actualCol, predictedCol)
    // ONE reference to cm: the previous classes/support/n_predicted/tp
    // four-branch join replayed the corpus-wide confusion aggregation per
    // branch (cm is unpersisted, so each consumer recomputes the scan —
    // measured 5x the corpus work on the q263 languageId input). Each cm
    // row instead explodes into its two class roles and ONE tiny keyed
    // aggregation over |classes|² rows derives all three totals; the
    // class universe (union of roles) falls out of the same explode.
    val roles = cm.select(explode(array(
        struct(col("actual").as("clazz"), col("n").as("support"),
          lit(0L).as("n_predicted"),
          when(col("actual") === col("predicted"), col("n"))
            .otherwise(lit(0L)).as("tp")),
        struct(col("predicted").as("clazz"), lit(0L).as("support"),
          col("n").as("n_predicted"), lit(0L).as("tp")))).as("r"))
      .select(col("r.clazz").as("clazz"), col("r.support").as("support"),
        col("r.n_predicted").as("n_predicted"), col("r.tp").as("tp"))
    val base = roles.groupBy(col("clazz"))
      .agg(sum(col("support")).as("support"),
        sum(col("n_predicted")).as("n_predicted"),
        sum(col("tp")).as("tp"))
    val prec = when(col("n_predicted") > 0,
      TextAnalysis.round6(col("tp").cast("double") / col("n_predicted")))
    val rec = when(col("support") > 0,
      TextAnalysis.round6(col("tp").cast("double") / col("support")))
    base.withColumn("precision", prec)
      .withColumn("recall", rec)
      .withColumn("f1",
        when(col("precision").isNotNull && col("recall").isNotNull &&
          col("precision") + col("recall") > 0,
          TextAnalysis.round6(
            lit(2.0) * col("precision") * col("recall") /
              (col("precision") + col("recall")))))
  }

  /** Cohen's kappa — chance-corrected agreement between two labelers
    * (annotator vs annotator, or classifier vs gold): the number that
    * separates "94% raw agreement" on a 95%-majority-class corpus (kappa
    * ~ 0) from genuine skill. Multi-class, from the same one-pass
    * confusion counts as [[confusionMatrix]]; everything after that
    * aggregation runs on the |classes|^2 matrix, never the corpus.
    *
    * Exact-arithmetic contract: kappa = (n*diag - S) / (n^2 - S) with
    * S = sum over classes of rowTotal*colTotal — integer products summed
    * in DECIMAL(38,0), ONE snapped division at the end (no intermediate
    * p_o/p_e rounding error compounds). p_o and p_e are reported as their
    * own snapped divisions of the same exact integers. Degenerate chance
    * agreement of 1 (both sides constant) yields NULL kappa — "undefined"
    * and "zero skill" must not collide.
    * Output: one row (kappa, p_o, p_e, n).
    */
  def cohensKappa(df: DataFrame, actualCol: String,
      predictedCol: String): DataFrame = {
    // cm appears three times below; the three identical corpus exchanges
    // collapse to one via ReuseExchange (same pattern as classMetrics)
    val cm = confusionMatrix(df, actualCol, predictedCol)
    val rowTot = cm.groupBy(col("actual").as("clazz"))
      .agg(sum(col("n")).as("rt"))
    val colTot = cm.groupBy(col("predicted").as("clazz"))
      .agg(sum(col("n")).as("ct"))
    // class universe = union of both margins; absent margin counts are 0
    val s = rowTot.join(colTot, Seq("clazz"), "full_outer")
      .agg(sum((coalesce(col("rt"), lit(0L)) * coalesce(col("ct"), lit(0L)))
        .cast("decimal(38,0)")).as("S"))
    val tot = cm.agg(
      sum(col("n")).as("n"),
      sum(when(col("actual") === col("predicted"), col("n")).otherwise(0L))
        .as("diag"))
    tot.crossJoin(s).select(
      when(col("n").cast("decimal(38,0)") * col("n") =!= col("S"),
        TextAnalysis.round6(
          (col("n").cast("decimal(38,0)") * col("diag") - col("S"))
            .cast("double") /
            (col("n").cast("decimal(38,0)") * col("n") - col("S"))
              .cast("double"))).as("kappa"),
      TextAnalysis.round6(col("diag").cast("double") / col("n")).as("p_o"),
      TextAnalysis.round6(col("S").cast("double") /
        (col("n").cast("decimal(38,0)") * col("n")).cast("double")).as("p_e"),
      col("n"))
  }

  /** Exact ROC AUC — the threshold-free ranking quality of a classifier
    * (the number quality-filter papers report next to F1): the
    * probability a random positive outranks a random negative, ties at
    * half credit. Computed WITHOUT a corpus-wide rank window: scores
    * aggregate to per-DISTINCT-SCORE (pos, neg) counts first, and the
    * cumulative walk runs over distinct scores only — snapped scores live
    * on the 1e-6 grid, so that window is bounded by ~1e6 rows no matter
    * the corpus (the histogram-cum argument). The numerator stays exact:
    * AUC = Σ_s pos_s · (2·cumNegBelow_s + neg_s) / (2·P·N), integer
    * arithmetic summed in DECIMAL, one snapped division at the end.
    * Output: one row (auc, n_pos, n_neg).
    */
  def aucRoc(scored: DataFrame, scoreCol: String, labelCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("int")
    val gc = groupCols.map(col)
    val g = scored.select(gc :+ s.as("score") :+ y.as("__y"): _*)
      .groupBy(gc :+ col("score"): _*)
      .agg(sum(when(col("__y") === 1, 1L).otherwise(0L)).as("pos"),
        sum(when(col("__y") === 0, 1L).otherwise(0L)).as("neg"))
    val w = (if (groupCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(gc: _*))
      .orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = g.withColumn("__cumneg",
      coalesce(sum(col("neg")).over(w), lit(0L)))
    val agg = cum.groupBy(gc: _*).agg(
      sum((col("pos") * (lit(2L) * col("__cumneg") + col("neg")))
        .cast("decimal(38,0)")).as("__num2"),
      sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"))
    agg.select(gc ++ Seq(
      when(col("n_pos") > 0 && col("n_neg") > 0,
        TextAnalysis.round6(col("__num2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")))).as("auc"),
      col("n_pos"), col("n_neg")): _*)
  }

  /** CALIBRATION bins (the reliability diagram's table): bucket scores
    * into `bins` equal-width cells over [0, 1] and report, per cell, the
    * count, the mean predicted score (exact DECIMAL sum of the already-
    * snapped scores) and the empirical positive rate — how a score
    * becomes a trustworthy keep-probability before thresholding a corpus
    * on it (an over-confident classifier silently shifts the data mix).
    * One keyed aggregation; empty cells are absent rows. Score exactly
    * 1.0 folds into the top bin.
    * Output: (bin, n, mean_score, pos_rate), both ratios 6-dec snapped.
    */
  def calibrationBins(scored: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"calibrationBins: need >= 2 bins, got $bins")
    val s = col(scoreCol).cast("double")
    scored
      .select(least(floor(s * bins).cast("long"), lit(bins.toLong - 1)).as("bin"),
        s.as("__s"), col(labelCol).cast("double").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        TextAnalysis.round6(
          sum(col("__s").cast("decimal(28,6)")).cast("double") / count(lit(1)))
          .as("mean_score"),
        TextAnalysis.round6(
          sum(col("__y").cast("decimal(28,6)")).cast("double") / count(lit(1)))
          .as("pos_rate"))
  }

  /** THRESHOLD sweep metrics — precision / recall / F1 at each candidate
    * cut, the table that picks a quality classifier's operating point
    * before it filters a corpus. ONE pass: the row side is crossed with
    * the tiny broadcast threshold list (corpus x |thresholds| rows, but
    * partial map-side aggregation collapses them before the shuffle — the
    * shuffle carries |thresholds| partials per task), counts are exact
    * integers, ratios 6-dec snapped, and an undefined ratio (empty
    * denominator) is NULL, not 0 — "no predictions" and "all wrong" must
    * not collide. Predicted positive = score >= threshold.
    * Output: (threshold, tp, fp, fn, tn, precision, recall, f1).
    */
  def thresholdMetrics(scored: DataFrame, scoreCol: String, labelCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "thresholdMetrics: need thresholds")
    val spark = scored.sparkSession
    import spark.implicits._
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("int")
    val t = broadcast(thresholds.toDF("threshold"))
    val joined = scored.select(s.as("__s"), y.as("__y")).crossJoin(t)
    def cnt(p: Column) = sum(when(p, 1L).otherwise(0L))
    val m = joined.groupBy(col("threshold"))
      .agg(cnt(col("__s") >= col("threshold") && col("__y") === 1).as("tp"),
        cnt(col("__s") >= col("threshold") && col("__y") === 0).as("fp"),
        cnt(col("__s") < col("threshold") && col("__y") === 1).as("fn"),
        cnt(col("__s") < col("threshold") && col("__y") === 0).as("tn"))
    val prec = when(col("tp") + col("fp") > 0,
      TextAnalysis.round6(col("tp").cast("double") / (col("tp") + col("fp"))))
    val rec = when(col("tp") + col("fn") > 0,
      TextAnalysis.round6(col("tp").cast("double") / (col("tp") + col("fn"))))
    m.withColumn("precision", prec)
      .withColumn("recall", rec)
      .withColumn("f1",
        when(col("precision").isNotNull && col("recall").isNotNull &&
          col("precision") + col("recall") > 0,
          TextAnalysis.round6(
            lit(2.0) * col("precision") * col("recall") /
              (col("precision") + col("recall")))))
  }

  /** WILSON score interval for a proportion (Wilson 1927) — the
    * confidence band every rate readout (conversion, defect rate, match
    * precision) should ship with instead of the normal approximation,
    * which collapses at p̂ near 0/1 or small n where curation decisions
    * actually live. Given per-row (hits, n): center = (p̂ + z²/2n) /
    * (1 + z²/n), halfwidth = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n).
    * A stateless codegen'd per-row map — no shuffle, composes after any
    * aggregation. z defaults to 1.959964 (95%, the snapped constant both
    * engines multiply identically). n = 0 rows yield NULL bounds.
    * Output: input + (p_hat, ci_lo, ci_hi), all 6-dec snapped;
    * bounds clamped to [0, 1].
    */
  def wilsonInterval(df: DataFrame, hitsCol: String, nCol: String,
      z: Double = 1.959964): DataFrame = {
    require(z > 0, s"wilsonInterval: z must be > 0, got $z")
    val n = col(nCol).cast("double")
    val p = col(hitsCol).cast("double") / n
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / n
    val center = (p + z2 / (lit(2.0) * n)) / denom
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / n +
      z2 / (lit(4.0) * n * n)) / denom
    df.withColumn("p_hat", when(n > 0, TextAnalysis.round6(p)))
      .withColumn("ci_lo",
        when(n > 0, TextAnalysis.round6(greatest(lit(0.0), center - half))))
      .withColumn("ci_hi",
        when(n > 0, TextAnalysis.round6(least(lit(1.0), center + half))))
  }

  /** CLASS-BALANCE WEIGHTS by effective number of samples (Cui et al.
    * 2019, "Class-Balanced Loss Based on Effective Number of Samples"):
    * raw inverse-frequency over-weights rare classes because marginal
    * samples overlap; the effective count E_c = (1 − β^{n_c})/(1 − β)
    * discounts that, and the loss weight is its inverse, normalized so
    * Σ w_c = C (the paper's convention — a C-class uniform set gets all
    * 1.0). β → 0 degenerates to unweighted, β → 1 to inverse frequency.
    *
    * Scale shape: ONE keyed count aggregation (map-side partials) + a
    * 1-row normalizer broadcast — the weight table is class-cardinality
    * sized and feeds a broadcast join onto the training frame.
    * Determinism: β^n snaps to the 1e-6 grid straight off the pow (libm
    * ulp absorption), inverses snap, the normalizer sums exact decimals,
    * the final weight snaps once. NULL classes are a class (they will
    * be trained on). Output: (classCol, n, weight).
    */
  def classBalanceWeights(df: DataFrame, classCol: String,
      beta: Double = 0.999): DataFrame = {
    require(beta > 0 && beta < 1,
      s"classBalanceWeights: beta must be in (0,1), got $beta")
    val r6 = (c: org.apache.spark.sql.Column) => TextAnalysis.round6(c)
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("n"))
      .withColumn("__inv", r6((lit(1.0) - beta) /
        (lit(1.0) - r6(pow(lit(beta), col("n"))))))
    val norm = counts.agg(
      sum(col("__inv").cast("decimal(28,6)")).cast("double").as("__s"),
      count(lit(1)).as("__c"))
    counts.crossJoin(broadcast(norm))
      .select(col(classCol), col("n"),
        r6(col("__inv") * col("__c") / col("__s")).as("weight"))
  }

  /** LEAVE-ONE-OUT target encoding of a categorical feature (Micci-Barreca
    * 2001's empirical-Bayes family, the LOO variant): each row's encoding
    * is the mean target of the OTHER rows in its category,
    * (Σ_cat y − y_row) / (n_cat − 1) — the leak-free form (a row never
    * sees its own label; the naive per-category mean leaks the target
    * into the feature and inflates validation). Singleton categories and
    * NULL categories fall back to the global mean over all OTHER rows,
    * (Σ y − y_row) / (N − 1), the same LOO discipline at the corpus
    * level (degenerate 1-row corpus → NULL).
    *
    * Scale shape: one keyed aggregation to per-category (Σ, n) joined
    * back on the category (broadcastable — category cardinality, not row
    * count), plus a 1-row global frame; sums run in exact decimal so the
    * subtraction of the row's own y is drift-free; encodings snap to the
    * 1e-6 grid. Output: input columns + `te` — no shuffle of the fact
    * table beyond the category aggregation.
    */
  /** NORMALIZED MUTUAL INFORMATION between two categorical assignments —
    * the external clustering-quality score (cluster ids vs ground-truth
    * labels; Strehl/Ghosh 2002 sqrt normalization): NMI = I(U;V) /
    * √(H(U)·H(V)), 1 for identical partitions, ~0 for independent ones.
    * Every entropy/MI term is a snapped double of EXACT integer counts,
    * summed as exact decimals — engine-reproducible like the other
    * metric heads. Either side constant (zero entropy) yields NULL (the
    * normalization is undefined, and "undefined" must not collide with
    * "no shared information").
    *
    * Shape at scale: one contingency aggregation keyed by (a, b) —
    * bounded by |A|·|B| cells, not corpus rows — two margin rollups OVER
    * THE CELLS, and 1-row total frames broadcast back. Output: one row
    * (n, mi, h_a, h_b, nmi).
    */
  def nmi(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import TextAnalysis.round6
    val cells = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__nij"))
    val aTot = cells.groupBy(col("__a")).agg(sum(col("__nij")).as("__ai"))
    val bTot = cells.groupBy(col("__b")).agg(sum(col("__nij")).as("__bj"))
    val nRow = cells.agg(sum(col("__nij")).as("n"))
    val miRow = cells.join(aTot, "__a").join(bTot, "__b")
      .crossJoin(broadcast(nRow))
      .agg(sum(round6(
        (col("__nij").cast("double") / col("n")) *
          log(col("n").cast("double") * col("__nij") /
            (col("__ai").cast("double") * col("__bj"))))
        .cast("decimal(38,6)")).cast("double").as("mi"))
    def entropy(m: DataFrame, cnt: String, out: String) =
      m.crossJoin(broadcast(nRow))
        .agg((-sum(round6((col(cnt).cast("double") / col("n")) *
          log(col(cnt).cast("double") / col("n")))
          .cast("decimal(38,6)")).cast("double")).as(out))
    miRow.crossJoin(entropy(aTot, "__ai", "h_a"))
      .crossJoin(entropy(bTot, "__bj", "h_b"))
      .crossJoin(broadcast(nRow))
      .select(col("n"),
        // the outer snap also normalizes -0.0 (a negated zero sum) to
        // +0.0 so the two engines hash identically on degenerate inputs
        round6(col("mi")).as("mi"),
        round6(col("h_a")).as("h_a"), round6(col("h_b")).as("h_b"),
        when(col("h_a") > 0.0 && col("h_b") > 0.0,
          round6(col("mi") / sqrt(col("h_a") * col("h_b")))).as("nmi"))
  }

  /** ADJUSTED RAND INDEX + FOWLKES-MALLOWS from the pair-confusion
    * matrix — [[nmi]]'s chance-corrected companions (Hubert/Arabie 1985;
    * Fowlkes/Mallows 1983): over all C(n,2) row pairs, TP = pairs
    * together in BOTH partitions (Σ C(nᵢⱼ,2) over contingency cells),
    * FP/FN from the margins, TN the rest; ARI =
    * 2(TP·TN − FN·FP) / ((TP+FN)(FN+TN) + (TP+FP)(FP+TN)) and
    * FM = TP/√((TP+FP)(TP+FN)). Unlike the entropy scores these are
    * EXACT INTEGER arithmetic end to end (pair counts as exact
    * decimals, one snapped division each) — n up to ~3·10⁷ keeps the
    * products under 2⁵³ through the DECIMAL(38,0) path. Degenerate
    * cases: an all-zero ARI denominator with perfect agreement
    * (FP = FN = 0 — both partitions trivial and identical) reports 1.0
    * (the sklearn convention); otherwise NULL. FM is NULL when either
    * partition has no within-cluster pair.
    *
    * Shape at scale: the same one contingency aggregation as [[nmi]]
    * (bounded by |A|·|B| cells), margin rollups over cells, three 1-row
    * frames crossed. Output: one row (n, tp, fp, fn, tn, ari,
    * fowlkes_mallows).
    */
  def pairwiseClusterAgreement(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    import TextAnalysis.round6
    def pairs2(c: Column) = (c.cast("decimal(38,0)") * (c - 1) / 2)
      .cast("decimal(38,0)")
    val cells = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__nij"))
    val tpRow = cells.agg(sum(pairs2(col("__nij"))).as("__tp"),
      sum(col("__nij")).as("n"))
    val saRow = cells.groupBy(col("__a")).agg(sum(col("__nij")).as("__ai"))
      .agg(sum(pairs2(col("__ai"))).as("__sa"))
    val sbRow = cells.groupBy(col("__b")).agg(sum(col("__nij")).as("__bj"))
      .agg(sum(pairs2(col("__bj"))).as("__sb"))
    val joined = tpRow.crossJoin(broadcast(saRow)).crossJoin(broadcast(sbRow))
      .select(col("n"), col("__tp").as("tp"),
        (col("__sa") - col("__tp")).as("fp"),
        (col("__sb") - col("__tp")).as("fn"),
        (pairs2(col("n")) - col("__sa") - col("__sb") + col("__tp")).as("tn"))
    // pair-count SUMS stay exact decimals; the products move to DOUBLE
    // (exact below ~2^26 pairs per term, and a decimal(38,0)×decimal(38,0)
    // would overflow the 38-digit cap on either engine) in a FIXED order
    // both engines reproduce
    def d(c: Column) = c.cast("double")
    val num = lit(2.0) * (d(col("tp")) * d(col("tn")) - d(col("fn")) * d(col("fp")))
    val den = (d(col("tp")) + d(col("fn"))) * (d(col("fn")) + d(col("tn"))) +
      (d(col("tp")) + d(col("fp"))) * (d(col("fp")) + d(col("tn")))
    val fmDen = (d(col("tp")) + d(col("fp"))) * (d(col("tp")) + d(col("fn")))
    joined.select(col("n"), col("tp").cast("long").as("tp"),
      col("fp").cast("long").as("fp"), col("fn").cast("long").as("fn"),
      col("tn").cast("long").as("tn"),
      when(den > 0.0, round6(num / den))
        .when(col("fp") === 0 && col("fn") === 0, lit(1.0)).as("ari"),
      when(fmDen > 0.0, round6(d(col("tp")) / sqrt(fmDen)))
        .as("fowlkes_mallows"))
  }

  def targetEncodeLoo(df: DataFrame, catCol: String, targetCol: String): DataFrame = {
    val y = col(targetCol).cast("decimal(28,6)")
    val byCat = df.filter(col(catCol).isNotNull)
      .groupBy(col(catCol))
      .agg(sum(y).as("__sum_c"), count(lit(1)).as("__n_c"))
    val global = df.agg(
      coalesce(sum(y), lit(0).cast("decimal(28,6)")).as("__sum_g"),
      count(lit(1)).as("__n_g"))
    df.join(byCat, Seq(catCol), "left")
      .crossJoin(broadcast(global))
      .withColumn("te", TextAnalysis.round6(
        when(col(catCol).isNotNull && col("__n_c") > 1,
          (col("__sum_c") - y).cast("double") / (col("__n_c") - 1))
          .when(col("__n_g") > 1,
            (col("__sum_g") - y).cast("double") / (col("__n_g") - 1))
          .otherwise(lit(null).cast("double"))))
      .drop("__sum_c", "__n_c", "__sum_g", "__n_g")
  }
}
