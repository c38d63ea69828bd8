package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketching. Off-the-shelf streaming sketches
  * (engine-native HLL, CPC) are engine-private bit soups no SQL oracle can
  * mirror; the two forms here are built so an oracle CAN: the bottom-θ
  * (fixed-threshold KMV / theta) sketch, and an md5-derived HyperLogLog
  * ([[hllRegisters]]/[[hllDistinct]]) whose register math is plain integer
  * algebra. The theta sketch keeps only keys whose
  * uniform 32-bit hash falls below 2^32/θ⁻¹, count them distinct, scale
  * by θ⁻¹. Every step is integer arithmetic over md5 — the estimate is a
  * deterministic function of the key set.
  *
  * Scale shape: the hash filter is a stateless codegen'd predicate that
  * prunes (θ⁻¹-1)/θ⁻¹ of all rows BEFORE the shuffle — the distinct
  * aggregation then shuffles only the surviving ~n/θ⁻¹ keys (this is the
  * point of the sketch: the exact count shuffles everything). Standard
  * error ≈ sqrt(θ⁻¹/n_distinct): θ⁻¹=16 over 100k distinct keys is ~1.3%.
  * Sketches over different slices merge by construction (same salt ->
  * same retained key set -> union then re-count).
  */
object Sketches {

  /** Per-group distinct-count estimate via the bottom-θ sketch.
    * Output: group columns + `sampled_distinct` (exact distinct survivors
    * below the threshold) + `estimated_distinct` (= sampled * θ⁻¹, exact
    * integer arithmetic).
    */
  def thetaDistinct(df: DataFrame, groupCols: Seq[String], keyCol: String,
      thetaInverse: Int, salt: String = "theta"): DataFrame = {
    require(thetaInverse >= 1, s"thetaDistinct: thetaInverse must be >= 1, got $thetaInverse")
    val cut = math.round(4294967296.0 / thetaInverse)
    df.filter(Sampling.keyHash32(col(keyCol), salt) < cut)
      .groupBy(groupCols.map(col): _*)
      .agg(count_distinct(col(keyCol)).as("sampled_distinct"))
      .withColumn("estimated_distinct",
        col("sampled_distinct") * thetaInverse.toLong)
  }

  /** The two 32-bit md5 words of `salt:key` — the same Kirsch–Mitzenmacher
    * double-hashing family as the MinHash/Bloom kernels: row j hashes to
    * (w1 + j * w2) mod width.
    */
  private[pipeline] def hashWords(keyCol: String, salt: String): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val k = md5(concat(lit(salt + ":"), col(keyCol).cast("string")))
    (conv(substring(k, 1, 8), 16, 10).cast("long"),
      conv(substring(k, 9, 8), 16, 10).cast("long"))
  }

  /** Count-Min sketch BUILD: a depth x width grid of occurrence counts —
    * the bounded-memory frequency summary (heavy-hitter estimation,
    * per-key rate limiting) whose state is depth*width longs no matter
    * how many distinct keys stream through. Each occurrence increments
    * one bucket per row (bucket_j = (w1 + j*w2) mod width); the build is
    * one keyed aggregation whose shuffle carries at most depth*width
    * partial counts per map task, NOT the key stream. Deterministic:
    * md5-derived buckets, integer counts — exactly mirrorable in SQL.
    * Output: (j, bucket, c).
    */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int = 3,
      width: Int = 1024, salt: String = "cms"): DataFrame = {
    require(depth >= 1 && width >= 2, s"cmsBuild: bad grid ${depth}x$width")
    val (w1, w2) = hashWords(keyCol, salt)
    df.select(w1.as("__w1"), w2.as("__w2"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("j"),
        col("__w1"), col("__w2"))
      .select(col("j"), pmod(col("__w1") + col("j") * col("__w2"), lit(width.toLong)).as("bucket"))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Mergeable fixed-grid histogram — the primitive under
    * [[histogramQuantiles]], exposed because histograms over the SAME
    * (lo, hi, bins) grid merge by per-bin addition (union the frames,
    * re-aggregate): the property that lets per-shard/per-day sketches
    * roll up without touching raw data. Output: (bin, c), at most `bins`
    * rows. One stateless codegen'd projection + one keyed aggregation
    * whose shuffle carries at most `bins` partial counts per map task.
    */
  def histogramBins(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      bins: Int): DataFrame = {
    require(bins >= 2, s"histogramBins: need >= 2 bins, got $bins")
    require(hi > lo, s"histogramBins: need hi > lo, got [$lo, $hi]")
    val width = (hi - lo) / bins
    // nulls must not bin: a NULL value floors to a NULL bin row, and the
    // nulls-first cumulative window downstream would count it before bin 0
    // while n counts only non-nulls — shifting every quantile low
    df.filter(col(valueCol).isNotNull)
      .select(least(
        floor((col(valueCol).cast("double") - lo) / width).cast("long"),
        lit(bins.toLong - 1)).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("c"))
  }

  /** Deterministic quantile estimates from the fixed-grid histogram — the
    * third classic sketch next to bottom-θ distinct and Count-Min: t-digest
    * / KLL give tighter bounds but are engine-specific float soups no SQL
    * oracle can mirror; a fixed grid over the observed [min, max] is exact
    * integer+IEEE arithmetic on any engine, with error bounded by one bin
    * width ((max-min)/bins).
    *
    * Algebra (every step engine-portable): rank(p) = max(ceil(p*n), 1);
    * the estimate for p is the UPPER edge `lo + (bin+1)*width` of the
    * first bin whose cumulative count reaches rank(p), rounded to 6
    * decimals. Scale shape: one O(1) driver range fact (min/max/count —
    * same planning-fact contract as the extent queries), one histogram
    * aggregation (shuffle <= bins partials per task), then cumulative +
    * probe joins over <= bins rows (the unpartitioned window is bounded by
    * `bins`, never by data — same justification as the heavy-hitter top-k).
    * Output: one row per prob: (prob, est).
    */
  def histogramQuantiles(df: DataFrame, valueCol: String, probs: Seq[Double],
      bins: Int = 1024): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"histogramQuantiles: probs must be in [0, 1], got $probs")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val row = df.agg(min(col(valueCol).cast("double")).as("lo"),
      max(col(valueCol).cast("double")).as("hi"),
      count(col(valueCol)).as("n")).head()
    require(!row.isNullAt(2) && row.getLong(2) > 0,
      "histogramQuantiles: no non-null values")
    val (lo, hi, n) = (row.getDouble(0), row.getDouble(1), row.getLong(2))
    val probsDf = probs.toDF("prob")
    if (hi == lo)
      return probsDf.select(col("prob"),
        lit(math.floor(lo * 1e6 + 0.5) / 1e6).as("est"))
    val width = (hi - lo) / bins
    val cum = histogramBins(df, valueCol, lo, hi, bins)
      .withColumn("cum", sum(col("c")).over(
        Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, 0)))
    probsDf
      .withColumn("__rank", greatest(ceil(col("prob") * n), lit(1L)))
      .join(broadcast(cum), col("cum") >= col("__rank"))
      .groupBy(col("prob"))
      .agg(min(col("bin")).as("__bin"))
      .select(col("prob"),
        TextAnalysis.round6(lit(lo) + (col("__bin") + 1) * width).as("est"))
  }

  /** Column PROFILING — the ingest-QA pass every pipeline runs on a new
    * drop before trusting it: one row per requested numeric column with
    * count / nulls / min / max / exact-decimal mean (6-dec snapped). ALL
    * columns profile in ONE aggregation pass over the scan (the naive
    * per-column loop rescans the table per column); the unpivot to rows
    * happens on the single aggregated row. Non-numeric columns are
    * rejected loudly rather than silently cast.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns: need at least one column")
    import org.apache.spark.sql.types._
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[NumericType],
        s"profileColumns: column '$c' is $dt, not numeric")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = cols.flatMap { c =>
      val v = col(c).cast("double")
      Seq(count(lit(1)).as(s"__t_$c"), count(v).as(s"__n_$c"),
        min(v).as(s"__min_$c"), max(v).as(s"__max_$c"),
        sum(v.cast("decimal(28,6)")).cast("double").as(s"__s_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    cols.map { c =>
      one.select(lit(c).as("column"),
        col(s"__n_$c").as("n"),
        (col(s"__t_$c") - col(s"__n_$c")).as("n_null"),
        col(s"__min_$c").as("min"), col(s"__max_$c").as("max"),
        TextAnalysis.round6(col(s"__s_$c") / col(s"__n_$c")).as("mean"))
    }.reduce(_.unionByName(_))
  }

  /** PER-GROUP quantile estimates — the grouped form of
    * [[histogramQuantiles]] (per-language score quantiles, per-label zonal
    * intensity quantiles, per-source length quantiles), and the fully
    * distributed one: the global version collects (lo, hi, n) as a driver
    * planning fact; here every group's range fact stays in a DataFrame and
    * rides a keyed join back onto the rows (the range frame has one row
    * per group — AQE broadcasts it when small). Same algebra per group as
    * the global sketch: fixed grid over the group's [min, max], rank(p) =
    * max(ceil(p*n), 1), estimate = 6-dec-snapped upper edge of the first
    * bin whose cumulative count reaches the rank; a degenerate group
    * (hi == lo) estimates its constant for every prob. The cumulative
    * window partitions BY GROUP over at most `bins` rows per group.
    * Output: (groupCol, prob, est), groups x probs rows.
    */
  def groupedHistogramQuantiles(df: DataFrame, groupCol: String,
      valueCol: String, probs: Seq[Double], bins: Int = 256): DataFrame = {
    require(bins >= 2, s"groupedHistogramQuantiles: need >= 2 bins, got $bins")
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"groupedHistogramQuantiles: probs must be in [0, 1], got $probs")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("double")
    val st = df.groupBy(col(groupCol))
      .agg(min(v).as("__lo"), max(v).as("__hi"), count(v).as("__n"))
      .filter(col("__n") > 0)
    val probsDf = probs.toDF("prob")
    val width = (col("__hi") - col("__lo")) / bins
    val binned = df.filter(v.isNotNull) // __n counts non-nulls; a NULL bin
      .join(st, Seq(groupCol))           // would cum-count ahead of bin 0
      .filter(col("__hi") > col("__lo"))
      .select(col(groupCol), col("__lo"), col("__hi"), col("__n"),
        least(floor((v - col("__lo")) / width).cast("long"),
          lit(bins.toLong - 1)).as("bin"))
    val cum = binned
      .groupBy(col(groupCol), col("__lo"), col("__hi"), col("__n"), col("bin"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    val est = cum.join(broadcast(probsDf),
        col("cum") >= greatest(ceil(col("prob") * col("__n")), lit(1L)))
      .groupBy(col(groupCol), col("prob"))
      .agg(min(col("bin")).as("__bin"),
        first(col("__lo")).as("__lo"), first(col("__hi")).as("__hi"))
      .select(col(groupCol), col("prob"),
        TextAnalysis.round6(
          col("__lo") + (col("__bin") + 1) * ((col("__hi") - col("__lo")) / bins))
          .as("est"))
    val degenerate = st.filter(col("__hi") === col("__lo"))
      .crossJoin(broadcast(probsDf))
      .select(col(groupCol), col("prob"),
        TextAnalysis.round6(col("__lo")).as("est"))
    est.unionByName(degenerate)
  }

  /** Count-Min PROBE: estimated occurrence count for each item = the
    * minimum of its depth bucket counters (never an undercount; overcounts
    * only by collisions, bounded by total/width per row w.h.p.). The
    * sketch side is at most depth*width rows — it broadcasts; probing any
    * number of items is a stateless equi-join + keyed min.
    * Output: (key, est_count).
    */
  def cmsEstimate(cms: DataFrame, items: DataFrame, keyCol: String,
      depth: Int = 3, width: Int = 1024, salt: String = "cms"): DataFrame = {
    val (w1, w2) = hashWords(keyCol, salt)
    items.select(col(keyCol), w1.as("__w1"), w2.as("__w2"))
      .select(col(keyCol),
        explode(sequence(lit(0), lit(depth - 1))).as("j"),
        col("__w1"), col("__w2"))
      .select(col(keyCol), col("j"),
        pmod(col("__w1") + col("j") * col("__w2"), lit(width.toLong)).as("bucket"))
      .join(broadcast(cms), Seq("j", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est_count"))
  }

  /** Merge Count-Min grids built with the SAME (depth, width, salt):
    * union, then per-(j, bucket) ADDITION — CMS is linear in its input,
    * so per-shard/per-day/per-batch grids roll up without touching raw
    * keys (the property [[EventStream.streamingCmsGrids]] leans on).
    * Unlike the HLL's MAX, addition is NOT replay-idempotent — merge each
    * source grid exactly once (the streaming form gets this from
    * batch-id-keyed partition overwrites, not from the merge).
    */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "cmsMerge: need at least one sketch")
    sketches.map(_.select(col("j"), col("bucket"), col("c")))
      .reduce(_.unionByName(_))
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("c")).as("c"))
  }

  /** Histogram-CDF PERCENTILE RANK — score calibration (the inverse of
    * [[histogramQuantiles]]): each row gets the estimated fraction of the
    * frame at or below its value's bin, `pct = round6(cum(bin(v)) / n)`,
    * error bounded by one bin's mass. This is how heterogeneous quality
    * signals become comparable before blending (rank-normalize each,
    * then combine) WITHOUT a corpus-wide rank window: one stats
    * aggregation, one <=`bins`-row cumulative table broadcast back onto
    * the scan, and a stateless bin projection. `groupCols` calibrates
    * within strata (per-language score norms); groups are calibration
    * strata — bounded, broadcastable. NULL values drop (they have no
    * rank); a degenerate group (hi == lo) puts every row at pct 1.
    */
  def percentileRank(df: DataFrame, valueCol: String, bins: Int = 256,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(bins >= 2, s"percentileRank: need >= 2 bins, got $bins")
    val v = col(valueCol).cast("double")
    val gcols = if (groupCols.isEmpty) Seq("__g") else groupCols
    val base0 = df.filter(v.isNotNull)
    val base = if (groupCols.isEmpty) base0.withColumn("__g", lit(1)) else base0
    val st = base.groupBy(gcols.map(col): _*)
      .agg(min(v).as("__lo"), max(v).as("__hi"), count(v).as("__n"))
    val binOf = when(col("__hi") > col("__lo"),
      least(floor((v - col("__lo")) / ((col("__hi") - col("__lo")) / bins))
        .cast("long"), lit(bins.toLong - 1))).otherwise(lit(0L))
    val binned = base.join(broadcast(st), gcols)
      .withColumn("__bin", binOf)
    val cum = binned.groupBy((gcols :+ "__bin").map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(gcols.map(col): _*).orderBy(col("__bin"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select((gcols :+ "__bin").map(col) :+ col("__cum"): _*)
    binned.join(broadcast(cum), gcols :+ "__bin")
      .withColumn("pct", TextAnalysis.round6(col("__cum") / col("__n")))
      .drop((Seq("__bin", "__lo", "__hi", "__n", "__cum", "__c") ++
        (if (groupCols.isEmpty) Seq("__g") else Nil)): _*)
  }

  /** QUANTILE NORMALIZATION across groups — map each group's value
    * distribution onto the GLOBAL distribution (the batch-effect
    * correction scores need before one global threshold: a source whose
    * quality scorer runs hot would otherwise dominate every top-p cut;
    * after normalization "top 10% of source A" and "top 10% of source B"
    * sit at the same value). v → global inverse-CDF(per-group CDF(v)),
    * both CDFs histogram estimates with error ≤ one bin's mass.
    *
    * Shape at scale: the per-group percentile is [[percentileRank]]
    * (groupCols form — cum walks bounded by `bins`, never a corpus
    * window); the global inverse CDF collapses to a DRIVER LITERAL lookup
    * table of ≤ `bins` (prevProb, cumProb, upperEdge] rows (the winsorize
    * precedent: an O(bins) planning handoff), so the lookup itself is a
    * stateless codegen `filter(lut, p ∈ (prev, cum])[0]` projection — no
    * range join, no broadcast nested loop. All probabilities and edges
    * snap to the 1e-6 grid with the same IEEE expressions on both
    * engines. Empty bins make empty (prev, cum] intervals — unmatchable,
    * so each pct lands in exactly one bin.
    * Output: input columns + `pct` (within-group percentile) +
    * `<valueCol>_qn` (the global-scale normalized value).
    */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
      bins: Int = 256): DataFrame = {
    require(bins >= 2, s"quantileNormalize: need >= 2 bins, got $bins")
    val ranked = percentileRank(df, valueCol, bins, Seq(groupCol))
    val v = col(valueCol).cast("double")
    val base = df.filter(v.isNotNull)
    val st = base.agg(min(v), max(v), count(v)).collect()(0)
    require(!st.isNullAt(0), "quantileNormalize: no non-null values")
    val (glo, ghi, gn) = (st.getDouble(0), st.getDouble(1), st.getLong(2))
    val binOf =
      if (ghi > glo)
        least(floor((v - glo) / ((ghi - glo) / bins)).cast("long"),
          lit(bins.toLong - 1))
      else lit(0L)
    val counts = base.withColumn("__gb", binOf)
      .groupBy(col("__gb")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    var acc = 0L
    val lut = counts.map { case (b, c) =>
      val prev = acc; acc += c
      (r6(prev.toDouble / gn), r6(acc.toDouble / gn),
        r6(glo + (b + 1).toDouble * (ghi - glo) / bins))
    }
    val lutCol = array(lut.toSeq.map { case (p, c, e) =>
      struct(lit(p).as("p"), lit(c).as("c"), lit(e).as("e"))
    }: _*)
    ranked.withColumn(s"${valueCol}_qn",
      element_at(filter(lutCol,
        s => col("pct") > s("p") && col("pct") <= s("c")), 1)("e"))
  }

  /** WINSORIZATION — clamp a value column to its [pLo, pHi] sketch
    * quantiles (outlier capping before means/z-scores/feature scaling: a
    * handful of corrupt extremes otherwise own the moments; capping beats
    * dropping when row identity must survive). Cutoffs come from
    * [[histogramQuantiles]] — 6-dec-snapped, error <= one bin width — and
    * land as two driver literals (the same O(1) planning-fact handoff as
    * the extent queries), so the rewrite itself is a stateless codegen'd
    * `greatest(least(v, hi), lo)` projection: no second shuffle, pushdown
    * unobstructed, NULL values pass through NULL. Clamping is pure
    * comparison — interior values pass through bit-identical, only the
    * tails meet the snapped cutoffs. Output: input columns +
    * `<valueCol>_w`.
    */
  def winsorize(df: DataFrame, valueCol: String, pLo: Double = 0.01,
      pHi: Double = 0.99, bins: Int = 1024): DataFrame = {
    require(pLo >= 0.0 && pHi <= 1.0 && pLo < pHi,
      s"winsorize: need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val cuts = histogramQuantiles(df, valueCol, Seq(pLo, pHi), bins)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val (lo, hi) = (cuts(pLo), cuts(pHi))
    // greatest/least SKIP nulls (greatest(null, lo) = lo) — gate on
    // non-null so a NULL value yields a NULL clamped value, not a cutoff
    df.withColumn(s"${valueCol}_w",
      when(col(valueCol).isNotNull,
        greatest(least(col(valueCol).cast("double"), lit(hi)), lit(lo))))
  }

  /** TWO-SAMPLE CHI-SQUARE DRIFT over a shared fixed grid — the
    * distribution-shift monitor between two corpus snapshots (yesterday's
    * crawl vs today's, train vs eval, pre- vs post-filter): histogram
    * both frames on the SAME (lo, hi, bins) grid (values outside clamp
    * into the edge bins) and compute the classic two-sample statistic
    * χ² = Σ_cells (o − e)² / e with e_cell = rowTotal · colTotal / N.
    * Unlike PSI/KL this needs NO logarithm — every step is exact integer
    * counts, correctly-rounded IEEE multiply/divide, 6-dec-snapped terms
    * and one exact DECIMAL sum, so the statistic reproduces bit-for-bit
    * on any engine. Degrees of freedom = (occupied bins − 1); the p-value
    * lookup is the consumer's choice (it needs an incomplete-gamma no two
    * engines round alike). Scale shape: two histogram aggregations
    * (shuffle <= bins partials per task) + arithmetic over <= bins rows.
    * Output: one row (chi2, dof, n_a, n_b).
    */
  def chiSquareDrift(a: DataFrame, b: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int = 64): DataFrame = {
    // greatest/least SKIP nulls — gate on non-null so NULL values stay
    // NULL and histogramBins drops them instead of clamping to an edge
    def clamped(df: DataFrame) = df.withColumn(valueCol,
      when(col(valueCol).isNotNull,
        greatest(least(col(valueCol).cast("double"), lit(hi)), lit(lo))))
    val ha = histogramBins(clamped(a), valueCol, lo, hi, bins)
      .select(col("bin"), col("c").as("ca"))
    val hb = histogramBins(clamped(b), valueCol, lo, hi, bins)
      .select(col("bin"), col("c").as("cb"))
    val cells = ha.join(hb, Seq("bin"), "full")
      .select(col("bin"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = cells.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val r6 = (c: org.apache.spark.sql.Column) => TextAnalysis.round6(c)
    cells.crossJoin(broadcast(tot)) // 1-row totals, the corpus-stats pattern
      .select(col("bin"), col("ca"), col("cb"), col("na"), col("nb"),
        ((col("ca") + col("cb")).cast("double") /
          (col("na") + col("nb"))).as("__p"))
      .select(col("bin"), col("na"), col("nb"),
        r6(when(col("na") * col("__p") > 0,
          (col("ca") - col("na") * col("__p")) * (col("ca") - col("na") * col("__p")) /
            (col("na") * col("__p"))).otherwise(lit(0.0))).as("__ta"),
        r6(when(col("nb") * col("__p") > 0,
          (col("cb") - col("nb") * col("__p")) * (col("cb") - col("nb") * col("__p")) /
            (col("nb") * col("__p"))).otherwise(lit(0.0))).as("__tb"))
      .groupBy(col("na").as("n_a"), col("nb").as("n_b"))
      .agg(
        TextAnalysis.round6(
          sum((col("__ta") + col("__tb")).cast("decimal(28,6)")).cast("double"))
          .as("chi2"),
        (count(lit(1)) - 1).as("dof"))
      .select(col("chi2"), col("dof"), col("n_a"), col("n_b"))
  }

  /** POPULATION STABILITY INDEX over the shared fixed grid — the
    * industry-standard drift score between two corpus snapshots
    * (credit-risk lineage; the "has the feature distribution moved?"
    * number dashboards alarm on): PSI = Σ_bins (pa − pb)·ln(pa/pb),
    * always ≥ 0, with the usual reading <0.1 stable / 0.1–0.25 moderate
    * / >0.25 shifted. Empty bins would blow up the log, so counts are
    * LAPLACE-SMOOTHED: p = (c + 0.5) / (n + 0.5·bins) over the DENSE
    * bin spine (every grid bin participates, occupied or not) — a fixed,
    * engine-portable convention, stated here because smoothed PSI values
    * differ from ad-hoc epsilon-clamp implementations. The log snaps to
    * the 1e-6 grid per bin and the sum runs in exact decimal
    * ([[chiSquareDrift]] is the log-free shape-drift twin; PSI is what
    * the monitoring playbook expects). Scale shape: two histogram
    * aggregations (≤ bins partials per task) + arithmetic over exactly
    * `bins` rows. Output: one row (psi, n_a, n_b).
    */
  def psiDrift(a: DataFrame, b: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int = 64): DataFrame = {
    val spark = a.sparkSession
    def clamped(df: DataFrame) = df.withColumn(valueCol,
      when(col(valueCol).isNotNull,
        greatest(least(col(valueCol).cast("double"), lit(hi)), lit(lo))))
    val ha = histogramBins(clamped(a), valueCol, lo, hi, bins)
      .select(col("bin"), col("c").as("ca"))
    val hb = histogramBins(clamped(b), valueCol, lo, hi, bins)
      .select(col("bin"), col("c").as("cb"))
    val spine = spark.range(bins).select(col("id").as("bin"))
    val cells = spine.join(ha, Seq("bin"), "left").join(hb, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = cells.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val r6 = (c: org.apache.spark.sql.Column) => TextAnalysis.round6(c)
    val k = lit(0.5 * bins)
    cells.crossJoin(broadcast(tot))
      .select(col("na"), col("nb"),
        ((col("ca") + 0.5) / (col("na") + k)).as("__pa"),
        ((col("cb") + 0.5) / (col("nb") + k)).as("__pb"))
      .select(col("na"), col("nb"),
        r6((col("__pa") - col("__pb")) * log(col("__pa") / col("__pb")))
          .as("__t"))
      .groupBy(col("na").as("n_a"), col("nb").as("n_b"))
      .agg(r6(sum(col("__t").cast("decimal(28,6)")).cast("double")).as("psi"))
      .select(col("psi"), col("n_a"), col("n_b"))
  }

  /** JENSEN-SHANNON DIVERGENCE over the shared fixed grid — the bounded
    * (≤ ln 2), SYMMETRIC drift score that, unlike [[psiDrift]], needs NO
    * smoothing convention: JSD = ½KL(a‖m) + ½KL(b‖m) with m the
    * midpoint mixture, and a bin empty on one side contributes the
    * finite p·ln2 from the other (0·ln0 ≡ 0 — the CASE is explicit so
    * both engines agree). Complements the family: χ² (shape, log-free),
    * PSI (the alarm convention), EMD (displacement units), KS (max cdf
    * gap), JSD (information units, metric when square-rooted). Snapped
    * per-bin terms, exact decimal sum, same two-histogram scale shape
    * as [[chiSquareDrift]]. Output: one row (jsd, n_a, n_b).
    */
  def jsDivergence(a: DataFrame, b: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int = 64): DataFrame = {
    def clamped(df: DataFrame) = df.withColumn(valueCol,
      when(col(valueCol).isNotNull,
        greatest(least(col(valueCol).cast("double"), lit(hi)), lit(lo))))
    val ha = histogramBins(clamped(a), valueCol, lo, hi, bins)
      .select(col("bin"), col("c").as("ca"))
    val hb = histogramBins(clamped(b), valueCol, lo, hi, bins)
      .select(col("bin"), col("c").as("cb"))
    val cells = ha.join(hb, Seq("bin"), "full")
      .select(coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = cells.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val r6 = (c: org.apache.spark.sql.Column) => TextAnalysis.round6(c)
    cells.crossJoin(broadcast(tot))
      .select(col("na"), col("nb"),
        (col("ca").cast("double") / col("na")).as("__pa"),
        (col("cb").cast("double") / col("nb")).as("__pb"))
      .withColumn("__m", (col("__pa") + col("__pb")) / 2)
      .select(col("na"), col("nb"),
        r6(when(col("__pa") > 0,
            col("__pa") / 2 * log(col("__pa") / col("__m")))
          .otherwise(lit(0.0))).as("__ta"),
        r6(when(col("__pb") > 0,
            col("__pb") / 2 * log(col("__pb") / col("__m")))
          .otherwise(lit(0.0))).as("__tb"))
      .groupBy(col("na").as("n_a"), col("nb").as("n_b"))
      .agg(r6(sum((col("__ta") + col("__tb")).cast("decimal(28,6)"))
        .cast("double")).as("jsd"))
      .select(col("jsd"), col("n_a"), col("n_b"))
  }

  /** 1-D EARTH MOVER'S DISTANCE (Wasserstein-1) over the shared fixed
    * grid — the drift metric that knows HOW FAR mass moved, not just
    * that bins disagree (χ²/PSI score a one-bin-over shift and a
    * cross-range shift identically; EMD scales with displacement, in
    * VALUE units). Closed form in 1-D: EMD = Σ_bins |cdfA − cdfB| ·
    * binWidth, with cdfs from cumulative counts over the DENSE bin
    * spine (empty bins still carry the standing |cdf gap|). Entirely
    * log-free — exact integer cumulations, one IEEE division per side,
    * snapped terms, exact decimal sum. The cumulative window runs over
    * exactly `bins` rows, never corpus rows; everything upstream is the
    * two histogram aggregations. Output: one row (emd, n_a, n_b).
    */
  def emdDrift(a: DataFrame, b: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = a.sparkSession
    def clamped(df: DataFrame) = df.withColumn(valueCol,
      when(col(valueCol).isNotNull,
        greatest(least(col(valueCol).cast("double"), lit(hi)), lit(lo))))
    val ha = histogramBins(clamped(a), valueCol, lo, hi, bins)
      .select(col("bin"), col("c").as("ca"))
    val hb = histogramBins(clamped(b), valueCol, lo, hi, bins)
      .select(col("bin"), col("c").as("cb"))
    val spine = spark.range(bins).select(col("id").as("bin"))
    val cells = spine.join(ha, Seq("bin"), "left").join(hb, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = cells.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val r6 = (c: org.apache.spark.sql.Column) => TextAnalysis.round6(c)
    // bounded window: exactly `bins` rows
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val width = lit((hi - lo) / bins)
    cells.crossJoin(broadcast(tot))
      .select(col("bin"), col("na"), col("nb"),
        (sum(col("ca")).over(w).cast("double") / col("na")).as("__fa"),
        (sum(col("cb")).over(w).cast("double") / col("nb")).as("__fb"))
      .select(col("na"), col("nb"),
        r6(abs(col("__fa") - col("__fb")) * width).as("__t"))
      .groupBy(col("na").as("n_a"), col("nb").as("n_b"))
      .agg(r6(sum(col("__t").cast("decimal(28,6)")).cast("double")).as("emd"))
      .select(col("emd"), col("n_a"), col("n_b"))
  }

  /** KAPLAN-MEIER survival estimator (Kaplan & Meier 1958) — the
    * censoring-aware retention/churn curve ([[retentionCohorts]] reads
    * raw fractions and silently treats "still subscribed" as "will
    * churn"; KM is the standard fix): rows are (duration, event) with
    * event = 1 an observed event (churn/failure) and 0 right-censored
    * (still alive at last observation). At each distinct event time t
    * with n_t subjects still at risk and d_t events,
    *
    *   S(t) = Π_{u ≤ t, d_u > 0} (1 − d_u / n_u)
    *
    * Determinism without a product aggregate (no engine guarantees
    * multiply order): each factor's LOG snaps to the 1e-6 grid, the
    * cumulative log-sum runs in exact decimal over the ordered distinct-
    * time frame, and S = round6(exp(sum)) — the [[graft.pipeline
    * .TextAnalysis.dsirWeights]] exp∘snap discipline. A time where
    * everyone at risk dies (d = n) zeroes the curve from there on (the
    * log would be −∞), tracked as an explicit flag.
    *
    * DISCRETE-durations contract (the [[spearman]] stance): bucket
    * continuous times first (days/hours) — every aggregation and window
    * here is over DISTINCT durations, so the whole curve costs the
    * bucket count, never subjects. One keyed aggregation over subjects
    * is the only corpus-scale pass. Output: one row per distinct
    * duration with d > 0 or c > 0: (t, n_risk, n_events, n_censored,
    * survival).
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
      eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byT = df.filter(col(durationCol).isNotNull)
      .groupBy(col(durationCol).cast("long").as("t"))
      .agg(sum(when(col(eventCol) > 0, 1L).otherwise(0L)).as("n_events"),
        sum(when(col(eventCol) > 0, 0L).otherwise(1L)).as("n_censored"))
    val total = byT.agg(
      coalesce(sum(col("n_events") + col("n_censored")), lit(0L)).as("__all"))
    // bounded windows: frames hold distinct durations, never subjects
    val wBefore = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wUpto = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val r6 = (c: org.apache.spark.sql.Column) => TextAnalysis.round6(c)
    byT.crossJoin(broadcast(total))
      .withColumn("n_risk", col("__all") -
        coalesce(sum(col("n_events") + col("n_censored")).over(wBefore), lit(0L)))
      .withColumn("__lf", when(col("n_events") === 0, lit(0.0))
        .when(col("n_events") < col("n_risk"),
          r6(log(lit(1.0) - col("n_events").cast("double") / col("n_risk")))))
      .withColumn("__dead",
        max((col("n_events") === col("n_risk")).cast("int")).over(wUpto))
      .withColumn("survival",
        when(col("__dead") === 1, lit(0.0)).otherwise(r6(exp(
          sum(col("__lf").cast("decimal(28,6)")).over(wUpto).cast("double")))))
      .select(col("t"), col("n_risk"), col("n_events"), col("n_censored"),
        col("survival"))
  }

  /** LOG-RANK TEST (Mantel 1966) — "are these two survival curves the
    * same?", the hypothesis-test companion to [[kaplanMeier]] (an A/B
    * readout on churn needs more than two curves that LOOK different):
    * at each pooled distinct event time with n₁, n₂ at risk and
    * d = d₁ + d₂ events,
    *
    *   E₁ = d·n₁/n,   V = d·(n₁/n)·(n₂/n)·(n−d)/(n−1)   [V = 0 at n = 1]
    *   Z  = Σ(d₁ − E₁) / sqrt(ΣV)  — χ²₁ = Z²; p-value lookup is the
    *   consumer's (the [[chiSquareDrift]] stance).
    *
    * Same DISCRETE-durations contract and determinism discipline as
    * [[kaplanMeier]]: per-time terms are fixed-order double expressions
    * snapped to the 1e-6 grid, sums run in exact decimal over the
    * pooled distinct-time frame (bounded windows — never subjects), the
    * final ratio snaps once. Two subject-scale aggregations total.
    * Output: one row (o_minus_e, var_sum, z, n_a, n_b); z NULL when the
    * variance sum is 0 (no comparable event times).
    */
  def logRankTest(a: DataFrame, b: DataFrame, durationCol: String,
      eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def byT(df: DataFrame, dn: String, cn: String) =
      df.filter(col(durationCol).isNotNull)
        .groupBy(col(durationCol).cast("long").as("t"))
        .agg(sum(when(col(eventCol) > 0, 1L).otherwise(0L)).as(dn),
          sum(when(col(eventCol) > 0, 0L).otherwise(1L)).as(cn))
    val spine = byT(a, "d1", "c1").join(byT(b, "d2", "c2"), Seq("t"), "full")
      .select(col("t"),
        coalesce(col("d1"), lit(0L)).as("d1"),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("d2"), lit(0L)).as("d2"),
        coalesce(col("c2"), lit(0L)).as("c2"))
    val tot = spine.agg(
      coalesce(sum(col("d1") + col("c1")), lit(0L)).as("__ta"),
      coalesce(sum(col("d2") + col("c2")), lit(0L)).as("__tb"))
    val wBefore = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val r6 = (c: org.apache.spark.sql.Column) => TextAnalysis.round6(c)
    val terms = spine.crossJoin(broadcast(tot))
      .withColumn("n1", col("__ta") -
        coalesce(sum(col("d1") + col("c1")).over(wBefore), lit(0L)))
      .withColumn("n2", col("__tb") -
        coalesce(sum(col("d2") + col("c2")).over(wBefore), lit(0L)))
      .withColumn("d", col("d1") + col("d2"))
      .withColumn("n", col("n1") + col("n2"))
      .filter(col("d") > 0)
      .select(col("__ta"), col("__tb"),
        r6(col("d1") - col("d").cast("double") * col("n1") / col("n"))
          .as("__ome"),
        when(col("n") > 1, r6(
          col("d").cast("double") * (col("n1").cast("double") / col("n")) *
            (col("n2").cast("double") / col("n")) *
            (col("n") - col("d")).cast("double") / (col("n") - 1)))
          .otherwise(lit(0.0)).as("__v"))
    terms.groupBy(col("__ta").as("n_a"), col("__tb").as("n_b"))
      .agg(sum(col("__ome").cast("decimal(28,6)")).cast("double")
          .as("o_minus_e"),
        sum(col("__v").cast("decimal(28,6)")).cast("double").as("var_sum"))
      .select(col("o_minus_e"), col("var_sum"),
        when(col("var_sum") > 0,
          r6(col("o_minus_e") / sqrt(col("var_sum")))).as("z"),
        col("n_a"), col("n_b"))
  }

  /** KENDALL'S TAU-B between two DISCRETE/snapped signal columns — the
    * concordant-vs-discordant ordinal agreement, tie-corrected (the
    * third agreement statistic next to Pearson and [[spearman]]; tau is
    * what ranking-eval literature quotes, and its pair semantics make
    * ties explicit where Spearman averages them away). Same discrete
    * contract as [[spearman]]: both columns must be low-cardinality
    * (bucketed/snapped signals), because the statistic is computed from
    * the JOINT CONTINGENCY TABLE, never row pairs — with n_ij the count
    * of rows at (a_i, b_j):
    *
    *   C  = Σ_ij n_ij · Σ_{k>i, l>j} n_kl     (concordant pairs)
    *   D  = Σ_ij n_ij · Σ_{k>i, l<j} n_kl     (discordant pairs)
    *   n0 = n(n−1)/2;  t_a, t_b = Σ ties within each column
    *   τ_b = (C − D) / sqrt((n0 − t_a)·(n0 − t_b))
    *
    * Scale shape: one keyed aggregation to the cell table (rows = joint
    * cardinality), a cells×cells inequality join over that BOUNDED frame
    * (the [[spearman]]-family cost statement: a hot signal costs its
    * distinct-value count squared, never corpus rows squared), two tiny
    * tie aggregations, exact LONG pair counts throughout. The one
    * non-integer step — the sqrt of a product that can exceed 2^53 —
    * runs as CAST-to-double-then-multiply in a FIXED order both engines
    * reproduce, then the ratio snaps to 1e-6. Output: one row
    * (tau_b, n_conc, n_disc, n).
    */
  def kendallTauB(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__n"))
    val l = cells.select(col("__a").as("__la"), col("__b").as("__lb"),
      col("__n").as("__ln"))
    val r = cells.select(col("__a").as("__ra"), col("__b").as("__rb"),
      col("__n").as("__rn"))
    val pairs = l.join(r, col("__la") < col("__ra"))
      .select(
        when(col("__lb") < col("__rb"), col("__ln") * col("__rn"))
          .otherwise(0L).as("__c"),
        when(col("__lb") > col("__rb"), col("__ln") * col("__rn"))
          .otherwise(0L).as("__d"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("n_conc"),
        coalesce(sum(col("__d")), lit(0L)).as("n_disc"))
    def tieHalfPairs(c: String) = cells.groupBy(col(c))
      .agg(sum(col("__n")).as("__cn"))
      .agg(coalesce(sum(col("__cn") * (col("__cn") - 1)), lit(0L)).as("t2"))
    val ta = tieHalfPairs("__a").select(col("t2").as("__ta2"))
    val tb = tieHalfPairs("__b").select(col("t2").as("__tb2"))
    val n = cells.agg(sum(col("__n")).as("__nn"))
    // everything is a 1-row frame from here — the broadcast-stats pattern
    val da = (col("__nn") * (col("__nn") - 1) - col("__ta2")).cast("double") / 2
    val db = (col("__nn") * (col("__nn") - 1) - col("__tb2")).cast("double") / 2
    pairs.crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .crossJoin(broadcast(n))
      .select(
        // a constant column (n0 == its ties) has no ordering signal -> NULL
        when(da > 0 && db > 0, TextAnalysis.round6(
          (col("n_conc") - col("n_disc")).cast("double") / sqrt(da * db)))
          .as("tau_b"),
        col("n_conc"), col("n_disc"), col("__nn").as("n"))
  }

  /** SPEARMAN rank correlation between two DISCRETE/snapped signal
    * columns — do two quality scorers agree on ordering? (the monotone-
    * agreement check before blending signals; Pearson would be fooled by
    * nonlinear but order-preserving scales). Tie-aware: each column
    * collapses to per-DISTINCT-value counts, average ranks come from a
    * cumulative walk over distinct values (avgRank = cumBelow +
    * (cnt+1)/2 — a .5-grid rational, exact in a double), ranks join back
    * keyed, and rho is Pearson over the rank pairs with every sum exact
    * in DECIMAL (ranks and rank products live on the .25 grid — DECIMAL
    * holds them exactly, so fold order is irrelevant); the final
    * combination is IEEE arithmetic over those exact sums, snapped.
    * Like [[percentileRank]]/aucRoc this is built for signals with
    * BOUNDED distinct values (snapped scores, counts, grades): the
    * cumulative window runs over distinct values, not rows — on a
    * continuous unsnapped column it would degrade to a corpus-wide walk;
    * snap first. Rows with a NULL on either side drop. Zero variance on
    * either side → NULL rho. Exactness bound: a rank product must stay
    * on the .25 grid of an IEEE double, which holds to n ≈ 4·10⁷ rows —
    * past that, draw a [[Sampling.prioritySample]]/hashSample first (a
    * rank statistic on a uniform sample is its standard estimator).
    * Output: one row (spearman, n).
    */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    def rankMap(c: String): DataFrame = {
      val w = Window.orderBy(col(c)).rowsBetween(Window.unboundedPreceding, -1)
      base.groupBy(col(c)).agg(count(lit(1)).as("__cnt"))
        .withColumn("__cumb", coalesce(sum(col("__cnt")).over(w), lit(0L)))
        .select(col(c), (col("__cumb") + (col("__cnt") + 1) / 2.0).as(s"__r$c"))
    }
    val ranked = base.join(rankMap("x"), Seq("x")).join(rankMap("y"), Seq("y"))
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,6)")).cast("double")
    val agg = ranked.agg(count(lit(1)).as("n"),
      dsum(col("__rx")).as("__sa"), dsum(col("__ry")).as("__sb"),
      dsum(col("__rx") * col("__rx")).as("__saa"),
      dsum(col("__ry") * col("__ry")).as("__sbb"),
      dsum(col("__rx") * col("__ry")).as("__sab"))
    val num = col("n") * col("__sab") - col("__sa") * col("__sb")
    val denx = col("n") * col("__saa") - col("__sa") * col("__sa")
    val deny = col("n") * col("__sbb") - col("__sb") * col("__sb")
    agg.select(
      when(denx > 0 && deny > 0,
        TextAnalysis.round6(num / sqrt(denx * deny))).as("spearman"),
      col("n"))
  }

  /** BENFORD first-digit audit — the "does this numeric column look
    * organically generated?" check (synthetic/fabricated/defaulted
    * numbers rarely follow the log-law real growth processes produce):
    * observed first-significant-digit shares vs Benford's expectation,
    * with a per-digit chi-square term (sum them and eyeball against the
    * 8-df quantile — the p-value lookup stays with the consumer, the
    * chiSquareDrift stance). The nine expected probabilities
    * log₁₀(1+1/d) are FIXED 1e-6-grid literals, so no engine ever
    * computes a logarithm. Contract: an INTEGRAL column (first-digit
    * extraction via integer-to-string is engine-identical; double
    * formatting is not, stated) — non-positive values drop. One keyed
    * agg; all nine digits always present (absent = 0).
    * Output: (digit 1..9, n_obs, p_obs, p_expected, chi2_term).
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val expected = Seq(1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939,
      4 -> 0.096910, 5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992,
      8 -> 0.051153, 9 -> 0.045757)
    val v = col(valueCol).cast("long")
    val obs = df.filter(v > 0)
      .select(substring(v.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = obs.agg(sum(col("n_obs")).as("__n"))
    expected.toDF("digit", "p_expected")
      .join(obs, Seq("digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"),
        TextAnalysis.round6(col("n_obs").cast("double") / col("__n"))
          .as("p_obs"),
        col("p_expected"),
        TextAnalysis.round6(
          (col("n_obs") - col("__n") * col("p_expected")) *
            (col("n_obs") - col("__n") * col("p_expected")) /
            (col("__n") * col("p_expected"))).as("chi2_term"))
  }

  /** k-ANONYMITY / l-DIVERSITY privacy audit — the re-identification
    * check a dataset needs before release or training-mix inclusion:
    * rows whose quasi-identifier combination (zip+age+gender-style) is
    * shared by fewer than k records are re-identifiable by linkage, and a
    * group whose sensitive column holds fewer than l distinct values
    * leaks the attribute even at size ≥ k (the homogeneity attack
    * l-diversity exists for). ONE keyed aggregation to the group table,
    * then one tiny rollup — exact integer counts throughout (the
    * l-diversity distinct agg is the one that costs, same stance as
    * expectations' Unique). NULL quasi values form their own group (NULL
    * zip is a linkable value too).
    * Output: one row (n_rows, n_groups, min_group_size, rows_below_k,
    * min_sensitive_diversity, rows_below_l).
    */
  def privacyAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long = 5L, l: Long = 2L): DataFrame = {
    require(quasiCols.nonEmpty, "privacyAudit: need quasi-identifier columns")
    require(k >= 1 && l >= 1, s"privacyAudit: k/l must be >= 1, got $k/$l")
    val g = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        countDistinct(col(sensitiveCol)).as("__l"))
    g.agg(
      sum(col("__n")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      min(col("__n")).as("min_group_size"),
      sum(when(col("__n") < k, col("__n")).otherwise(0L)).as("rows_below_k"),
      min(col("__l")).as("min_sensitive_diversity"),
      sum(when(col("__l") < l, col("__n")).otherwise(0L)).as("rows_below_l"))
  }

  /** WELCH'S t statistic between two samples — the unequal-variance mean
    * comparison behind every A/B readout and before/after drift check
    * ("did the mean quality score actually move?"); the p-value lookup is
    * left to the consumer exactly as [[chiSquareDrift]] leaves its
    * chi-square quantile (it needs engine-unportable special functions;
    * |t| > 2 is the usual eyeball line). Engine-exact arithmetic: inputs
    * snap to the 1e-6 grid so squares live on the 1e-12 grid; Σx and Σx²
    * accumulate in exact DECIMAL; sample variance
    * (n·Σx² − (Σx)²)/(n·(n−1)) is computed from those exact sums with one
    * double division; means snap; t = round6((mā − m̄b)/√(va/na + vb/nb)).
    * One aggregation per side. n < 2 on either side or zero pooled
    * standard error → NULL t.
    * Output: one row (t, mean_a, mean_b, n_a, n_b).
    */
  def welchT(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def side(df: DataFrame, tag: String): DataFrame = {
      val x = TextAnalysis.round6(col(valueCol).cast("double"))
      df.filter(col(valueCol).isNotNull)
        .select(x.as("__x"))
        .agg(count(lit(1)).as(s"n_$tag"),
          sum(col("__x").cast("decimal(38,6)")).as(s"__sx_$tag"),
          sum((col("__x") * col("__x")).cast("decimal(38,12)")).as(s"__sxx_$tag"))
    }
    def meanOf(tag: String) = TextAnalysis.round6(
      col(s"__sx_$tag").cast("double") / col(s"n_$tag"))
    // the sums are exact decimals; the n·Σx² − (Σx)² combination runs in
    // DOUBLE with a fixed expression shape (a decimal product here would
    // exceed DuckDB's strict 38-digit multiplication width) — identical
    // inputs + identical IEEE ops = identical t on both engines
    def varOf(tag: String) =
      (col(s"n_$tag").cast("double") * col(s"__sxx_$tag").cast("double") -
        col(s"__sx_$tag").cast("double") * col(s"__sx_$tag").cast("double")) /
        (col(s"n_$tag").cast("double") * (col(s"n_$tag") - 1))
    val joined = side(a, "a").crossJoin(side(b, "b"))
      .withColumn("mean_a", meanOf("a"))
      .withColumn("mean_b", meanOf("b"))
      .withColumn("__se2",
        when(col("n_a") >= 2 && col("n_b") >= 2,
          varOf("a") / col("n_a") + varOf("b") / col("n_b")))
    joined.select(
      when(col("__se2") > 0, TextAnalysis.round6(
        (col("mean_a") - col("mean_b")) / sqrt(col("__se2")))).as("t"),
      col("mean_a"), col("mean_b"), col("n_a"), col("n_b"))
  }

  /** MAD-based robust outlier flags per group — the heavy-tail-safe twin
    * of the z-score flag (one corrupt extreme inflates a standard
    * deviation until nothing else looks anomalous; the median absolute
    * deviation barely moves). Flag = |v − median| > k·1.4826·MAD, the
    * 1.4826 making k read in "σ-equivalents" under normality. Both
    * medians are [[groupedHistogramQuantiles]] sketch estimates (error ≤
    * one bin's width — the operator's documented contract; an EXACT
    * per-group median would cost a per-group sort and is engine-unportable
    * through interpolation anyway), so the whole statistic is snapped,
    * engine-reproducible arithmetic. Two sketch passes + two broadcast-
    * sized joins; a group costs its row count, never a sort.
    * Output: input columns + (med, abs_dev, robust_cut, is_outlier).
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0, bins: Int = 256): DataFrame = {
    require(k > 0, s"madOutliers: k must be > 0, got $k")
    val med = groupedHistogramQuantiles(df, groupCol, valueCol, Seq(0.5), bins)
      .select(col(groupCol), col("est").as("med"))
    val dev = df.join(med, Seq(groupCol))
      .withColumn("abs_dev",
        TextAnalysis.round6(abs(col(valueCol).cast("double") - col("med"))))
    val mad = groupedHistogramQuantiles(dev, groupCol, "abs_dev", Seq(0.5), bins)
      .select(col(groupCol), col("est").as("mad"))
    dev.join(mad, Seq(groupCol))
      .withColumn("robust_cut",
        TextAnalysis.round6(lit(k) * lit(1.4826) * col("mad")))
      .withColumn("is_outlier", col("abs_dev") > col("robust_cut"))
      .drop("mad")
  }

  /** CRAMÉR'S V — association strength between two CATEGORICAL columns
    * (0 = independent, 1 = determined): the feature-redundancy /
    * confounder check before using both signals ("is lang just a proxy
    * for source?"), and — like [[chiSquareDrift]] and [[giniSimpson]] —
    * LOGARITHM-FREE where mutual information would need engine-unportable
    * ln. One corpus aggregation to the ≤ r·c contingency matrix; expected
    * counts eᵢⱼ = rowᵢ·colⱼ/n from exact integer products, per-cell
    * snapped (o−e)²/e terms summed in exact DECIMAL (the chiSquareDrift
    * convention), then V = round6(√(χ² / (n·(min(r,c)−1)))) with one
    * correctly-rounded sqrt. A constant column (min(r,c)=1) yields NULL —
    * "no variation" is not "no association". NULLs count as a category.
    * Output: one row (v, chi2, n, r, c).
    */
  def cramersV(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cm = df.groupBy(col(colA).cast("string").as("__a"),
        col(colB).cast("string").as("__b"))
      .agg(count(lit(1)).as("__n"))
    val rt = cm.groupBy(col("__a")).agg(sum(col("__n")).as("__ra"))
    val ct = cm.groupBy(col("__b")).agg(sum(col("__n")).as("__cb"))
    val tot = cm.agg(sum(col("__n")).as("__t"),
      countDistinct(col("__a")).as("r"), countDistinct(col("__b")).as("c"))
    // the χ² sum runs over the FULL r×c grid — an absent combination is
    // an observed 0 with a nonzero expectation, not a missing term (a
    // perfectly-associated 2×2 would otherwise score V ≈ 0.707, not 1)
    val grid = rt.crossJoin(ct)
      .join(cm, Seq("__a", "__b"), "left")
      .withColumn("__o", coalesce(col("__n"), lit(0L)))
    val terms = grid.crossJoin(tot)
      .select(col("__t"), col("r"), col("c"),
        TextAnalysis.round6 {
          val e = (col("__ra") * col("__cb")).cast("decimal(38,0)")
            .cast("double") / col("__t")
          (col("__o") - e) * (col("__o") - e) / e
        }.as("__term"))
    terms.groupBy(col("__t"), col("r"), col("c"))
      .agg(sum(col("__term").cast("decimal(28,6)")).cast("double").as("chi2"))
      .select(
        when(least(col("r"), col("c")) > 1,
          TextAnalysis.round6(sqrt(col("chi2") /
            (col("__t").cast("decimal(38,0)") *
              (least(col("r"), col("c")) - 1)).cast("double")))).as("v"),
        col("chi2"), col("__t").as("n"), col("r"), col("c"))
  }

  /** Gini-Simpson diversity index per group — the probability two
    * documents drawn from a group differ on `catCol` (1 − Σ pᵢ²): the
    * corpus-mix health number behind "is this source all one language /
    * one domain / one template?" checks before training-mix decisions.
    * Unlike Shannon entropy it is LOGARITHM-FREE, so every step is
    * engine-portable arithmetic: per-(group, category) exact counts, the
    * index = round6(1 − Σ nᵢ² / n²) with the integer products summed in
    * DECIMAL(38,0) and ONE snapped division. Two keyed aggregations, both
    * with map-side partials — a group costs its category cardinality,
    * never its row count. NULL categories count as their own category
    * (an all-NULL column is maximally UNdiverse and must read 0, not be
    * silently dropped).
    * Output: (groupCols..., n, n_cats, gini).
    */
  def giniSimpson(df: DataFrame, groupCols: Seq[String],
      catCol: String): DataFrame = {
    val gc = groupCols.map(col)
    val counts = df
      .groupBy(gc :+ col(catCol).cast("string").as("__cat"): _*)
      .agg(count(lit(1)).as("__ni"))
    counts.groupBy(gc: _*)
      .agg(sum(col("__ni")).as("n"),
        count(lit(1)).as("n_cats"),
        TextAnalysis.round6(lit(1.0) -
          sum((col("__ni") * col("__ni")).cast("decimal(38,0)"))
            .cast("double") /
          (sum(col("__ni")).cast("decimal(38,0)") * sum(col("__ni")))
            .cast("double")).as("gini"))
  }

  /** Declarative data-quality EXPECTATIONS (Great-Expectations-lite) —
    * the contract a new data drop must pass before a pipeline trusts it,
    * next to [[profileColumns]]'s descriptive stats. Every check reduces
    * to exact counts gathered in ONE aggregation pass over the scan (the
    * naive per-check loop rescans the table per check); observed rates
    * snap to the 1e-6 grid so the report reproduces on any engine.
    * Checks: [[Check.NotNull]] (non-null rate >= minRate), [[Check.Unique]]
    * (distinct count == non-null count — the one check that costs a
    * distinct aggregation, stated), [[Check.InRange]] (rate of non-null
    * values inside [lo, hi] >= minRate), [[Check.InSet]] (rate of
    * non-null values in the accepted set >= minRate).
    * Output: (check, column, observed, threshold, pass) — one row per
    * check, `observed` the snapped rate (or distinct ratio for Unique).
    */
  sealed trait Check { def column: String }
  object Check {
    final case class NotNull(column: String, minRate: Double = 1.0) extends Check
    final case class Unique(column: String) extends Check
    final case class InRange(column: String, lo: Double, hi: Double,
        minRate: Double = 1.0) extends Check
    final case class InSet(column: String, values: Seq[String],
        minRate: Double = 1.0) extends Check
  }

  def expectations(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "expectations: need at least one check")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Column](
      count(lit(1)).as("__total"))
    checks.zipWithIndex.foreach { case (c, i) =>
      val v = col(c.column)
      c match {
        case Check.NotNull(_, _) =>
          aggs += count(v).as(s"__c$i")
        case Check.Unique(_) =>
          aggs += count(v).as(s"__n$i")
          aggs += count_distinct(v).as(s"__c$i")
        case Check.InRange(_, lo, hi, _) =>
          aggs += count(v).as(s"__n$i")
          aggs += sum(when(v.cast("double") >= lo && v.cast("double") <= hi, 1L)
            .otherwise(0L)).as(s"__c$i")
        case Check.InSet(_, values, _) =>
          aggs += count(v).as(s"__n$i")
          aggs += sum(when(v.cast("string").isin(values: _*), 1L)
            .otherwise(0L)).as(s"__c$i")
      }
    }
    val one = df.agg(aggs.head, aggs.tail.toSeq: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      val (name, obs, thr) = c match {
        case Check.NotNull(_, r) =>
          ("not_null", col(s"__c$i").cast("double") / col("__total"), r)
        case Check.Unique(_) =>
          ("unique", when(col(s"__n$i") > 0,
            col(s"__c$i").cast("double") / col(s"__n$i")).otherwise(lit(1.0)), 1.0)
        case Check.InRange(_, _, _, r) =>
          ("in_range", when(col(s"__n$i") > 0,
            col(s"__c$i").cast("double") / col(s"__n$i")).otherwise(lit(1.0)), r)
        case Check.InSet(_, _, r) =>
          ("in_set", when(col(s"__n$i") > 0,
            col(s"__c$i").cast("double") / col(s"__n$i")).otherwise(lit(1.0)), r)
      }
      val snapped = TextAnalysis.round6(obs)
      one.select(lit(name).as("check"), lit(c.column).as("column"),
        snapped.as("observed"), lit(thr).as("threshold"),
        (snapped >= thr).as("pass"))
    }
    rows.reduce(_.unionByName(_))
  }

  // ------------------------------------------------------------ HyperLogLog

  /** HyperLogLog REGISTERS (Flajolet et al. 2007) from the md5 hash — the
    * constant-memory distinct sketch whose state is 2^p max-rank registers
    * per group no matter how many keys stream through, and whose sketches
    * MERGE by per-register max (union frames, re-aggregate — see
    * [[hllMerge]]). Unlike the usual engine-private HLL bit soup, every
    * step here is integer algebra over md5 an oracle can mirror: bucket =
    * top p bits of hash32, rho = leading-zero count of the remaining
    * (32-p)-bit word + 1 via `bin()` string length (identical minimal
    * binary strings in any engine), register = max rho. Only NON-EMPTY
    * buckets materialize as rows (sparse form — merge and estimate both
    * treat absent buckets as rho 0).
    * Output: group columns + (bucket, rho).
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], keyCol: String,
      p: Int = 9, salt: String = "hll"): DataFrame = {
    require(p >= 2 && p <= 16, s"hllRegisters: p must be in [2, 16], got $p")
    val wbits = 32 - p
    val h = Sampling.keyHash32(col(keyCol), salt)
    val w = h.bitwiseAND(lit((1L << wbits) - 1))
    val rho = when(w > 0, lit(wbits + 1) - length(bin(w))).otherwise(lit(wbits + 1))
    df.select(groupCols.map(col) :+ shiftright(h, wbits).as("bucket") :+
        rho.cast("int").as("__rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("__rho")).as("rho"))
  }

  /** Merge HLL register frames built with the SAME (p, salt): union, then
    * per-(group, bucket) max. Absent buckets stay absent (rho 0).
    */
  def hllMerge(sketches: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(sketches.nonEmpty, "hllMerge: need at least one sketch")
    sketches.reduce(_.unionByName(_))
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** HLL distinct-count estimate from [[hllRegisters]]: the raw HLL
    * estimator E = alpha_m · m² / Σ_j 2^(-rho_j) over ALL m buckets
    * (absent = rho 0), kept deterministic by exact-integer harmonic
    * arithmetic: the sum is scaled by 2^(wbits+1) so every term
    * 2^(wbits+1-rho) is a BIGINT (shiftleft — no float pow), and the one
    * float step is a single division of driver-exact constants snapped to
    * the 1e-6 grid. The small-range (linear-counting) and large-range
    * corrections are the CONSUMER's choice — they need `ln`, whose last
    * ulp is not engine-portable; the raw estimator + `empty_buckets` give
    * a consumer everything those corrections need. Standard error ≈
    * 1.04/√m (p=9 → ~4.6%).
    * Output: group columns + (hit_buckets, empty_buckets, harmonic_scaled,
    * est_distinct).
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], keyCol: String,
      p: Int = 9, salt: String = "hll"): DataFrame = {
    val m = 1L << p
    val wbits = 32 - p
    val shift = wbits + 1 // >= max rho, so every harmonic term is integral
    // alpha_m · m² · 2^shift: exact-integer product times the standard bias
    // constant, computed ONCE on the driver — both engines divide the same
    // literal by the same exact-integer sum
    val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
    val numerator = alpha * m.toDouble * m.toDouble * (1L << shift).toDouble
    hllRegisters(df, groupCols, keyCol, p, salt)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("hit_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $shift - rho)")).as("__s_hit"))
      .select(groupCols.map(col) :+ col("hit_buckets") :+
        (lit(m) - col("hit_buckets")).as("empty_buckets") :+
        (col("__s_hit") +
          (lit(m) - col("hit_buckets")) * lit(1L << shift)).as("harmonic_scaled"): _*)
      .withColumn("est_distinct",
        TextAnalysis.round6(lit(numerator) / col("harmonic_scaled")))
  }

  /** Two-sample KOLMOGOROV–SMIRNOV statistic — the whole-shape drift
    * detector next to [[chiSquareDrift]] (which needs a grid and loses
    * within-bin movement) and [[welchT]] (which only sees the mean):
    * D = max_x |F_a(x) − F_b(x)| over the empirical CDFs. The usual
    * rejection line D > c(α)·√((n_a+n_b)/(n_a·n_b)) is left to the
    * consumer like the other tests' quantile lookups; the output carries
    * the √-scaled statistic so that comparison is one multiply.
    *
    * Engine-exact: values snap to the 1e-6 grid, per-DISTINCT-value
    * counts come from one keyed aggregation, and the CDF gap is
    * maximized as the exact INTEGER |ca·n_b − cb·n_a| (cumulative counts
    * cross-scaled — no per-row double division to disagree across
    * engines); D = that max divided once, snapped. The cumulative walk
    * runs over DISTINCT values only (the [[Classifier.aucRoc]] pattern)
    * — a single-partition window bounded by value cardinality, not row
    * count; snapped doubles cap it at ~2·10⁹ cells and real drift
    * monitors bin far coarser.
    *
    * Output: one row (d, d_scaled, n_a, n_b) — `d_scaled` =
    * round6(D·√(n_a·n_b/(n_a+n_b))), the quantity compared against c(α).
    */
  def ksTest(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def side(df: DataFrame, tag: Int): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .select(TextAnalysis.round6(col(valueCol).cast("double")).as("__v"),
          lit(tag).as("__side"))
    val counts = side(a, 0).unionByName(side(b, 1))
      .groupBy(col("__v"))
      .agg(sum(when(col("__side") === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__cb"))
    val w = Window.partitionBy().orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
    // grand totals ride every row as a broadcast 1-row frame so the gap
    // is the exact integer |ca·n_b − cb·n_a| with no per-row division
    val tot = counts.agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"))
    val gap = cum.crossJoin(broadcast(tot))
      .select(abs(col("__cuma") * col("n_b") - col("__cumb") * col("n_a"))
        .as("__gap"), col("n_a"), col("n_b"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("__gap")).as("__gapmax"))
    gap.select(
      when(col("n_a") > 0 && col("n_b") > 0, TextAnalysis.round6(
        col("__gapmax").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")))).as("d"),
      when(col("n_a") > 0 && col("n_b") > 0, TextAnalysis.round6(
        (col("__gapmax").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))) *
          sqrt(col("n_a").cast("double") * col("n_b").cast("double") /
            (col("n_a") + col("n_b")).cast("double")))).as("d_scaled"),
      col("n_a"), col("n_b"))
  }

  /** MANN–WHITNEY U / Wilcoxon rank-sum — the nonparametric "did the
    * distribution shift?" test that [[welchT]]'s mean comparison misses
    * when the data is heavy-tailed or ordinal (quality scores, ranks,
    * latencies): U counts how often an `a` value beats a `b` value, ties
    * counting half. Reported with the tie-corrected normal
    * approximation z = (U − n_a·n_b/2)/σ, σ² = (n_a·n_b/12)·((n+1) −
    * Σ(t³−t)/(n(n−1))) over tie-group sizes t (the standard correction;
    * p-value lookup left to the consumer as in [[welchT]]).
    *
    * Engine-exact: values snap, per-distinct-value counts aggregate
    * exactly, and 2U is assembled as an exact integer from midranks:
    * 2·R_a = Σ cnt_a·(2·c_before + t + 1) in DECIMAL, 2U = 2R_a −
    * n_a(n_a+1); U = that/2 is exact in IEEE (an integer halved). The
    * tie term Σ(t³−t) is an exact DECIMAL integer too; only σ and z run
    * in double, with a fixed expression shape both engines reproduce.
    * Same distinct-value cumulative walk as [[ksTest]] — bounded by
    * value cardinality, not rows.
    *
    * Output: one row (u_a, z, n_a, n_b); z is NULL when σ² ≤ 0 (all
    * values tied) or either side is empty.
    */
  def mannWhitneyU(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def side(df: DataFrame, tag: Int): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .select(TextAnalysis.round6(col(valueCol).cast("double")).as("__v"),
          lit(tag).as("__side"))
    val counts = side(a, 0).unionByName(side(b, 1))
      .groupBy(col("__v"))
      .agg(sum(when(col("__side") === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__cb"))
      .withColumn("__t", col("__ca") + col("__cb"))
    val w = Window.partitionBy().orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = counts.withColumn("__cbefore",
      coalesce(sum(col("__t")).over(w), lit(0L)))
    val agg = cum.agg(
      sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"),
      sum((col("__ca") * (lit(2L) * col("__cbefore") + col("__t") + 1L))
        .cast("decimal(38,0)")).as("__r2a"),
      sum((col("__t") * col("__t") * col("__t") - col("__t"))
        .cast("decimal(38,0)")).as("__ties"))
    agg.select(
      when(col("n_a") > 0 && col("n_b") > 0,
        (col("__r2a").cast("double") -
          col("n_a").cast("double") * (col("n_a") + 1L).cast("double")) / 2.0)
        .as("u_a"),
      col("n_a"), col("n_b"), col("__ties"))
      .withColumn("__n", col("n_a") + col("n_b"))
      .withColumn("__sigma2",
        when(col("n_a") > 0 && col("n_b") > 0 && col("__n") > 1,
          (col("n_a").cast("double") * col("n_b").cast("double") / 12.0) *
            ((col("__n") + 1L).cast("double") -
              col("__ties").cast("double") /
                (col("__n").cast("double") * (col("__n") - 1L).cast("double")))))
      .select(col("u_a"),
        when(col("__sigma2") > 0, TextAnalysis.round6(
          (col("u_a") - col("n_a").cast("double") * col("n_b").cast("double") / 2.0) /
            sqrt(col("__sigma2")))).as("z"),
        col("n_a"), col("n_b"))
  }

  /** FUNNEL STEP SUMMARY over arbitrary (user, ts, event) columns — the
    * per-step report every conversion dashboard shows: how many users
    * reached step k, and the rate vs step 1. Ordering is STRICT
    * ("after", not "at or after") and greedy-earliest: step 1's witness
    * is the user's earliest step-1 event; step k's witness is the
    * earliest step-k event strictly after the step-(k-1) witness, so a
    * later re-occurrence of an earlier step never resets the clock.
    *
    * Scale shape: one keyed min-aggregation per step over that step's
    * OWN filtered slice of the events (the filter is a pushed codegen
    * predicate — each pass shuffles only one step's events), chained by
    * keyed left joins on the user; nothing is ordered globally and no
    * per-user event list is materialized, so a power-law user is just a
    * bigger min() group. The final counts fold in ONE global aggregation
    * unpivoted through a literal-array explode.
    *
    * The fixed-schema ns-long twin for the gated events stream is
    * [[graft.streaming.EventStream.funnel]] (per-user witness frame);
    * this is the column-generalized summary over any orderable ts type.
    * Output: (step: int, event_type, n_users, conversion); conversion =
    * round6(n_k / n_1), NULL when nobody completes step 1.
    */
  def funnelSteps(ev: DataFrame, userCol: String, tsCol: String,
      eventCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps: need at least one step")
    require(steps.distinct.length == steps.length,
      s"funnelSteps: steps must be distinct, got $steps")
    def slice(t: String) = ev.filter(col(eventCol) === lit(t))
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
    var acc = slice(steps.head).groupBy(col("__u"))
      .agg(min(col("__ts")).as("__t1"))
    for (i <- 2 to steps.length) {
      val next = slice(steps(i - 1)).select(col("__u").as("__u2"), col("__ts"))
      acc = acc.join(next,
          col("__u") === col("__u2") && col("__ts") > col(s"__t${i - 1}"),
          "left")
        .groupBy(acc.columns.map(col): _*)
        .agg(min(col("__ts")).as(s"__t$i"))
    }
    val agg = acc.agg(count(col("__t1")).as("__n1"),
      (2 to steps.length).map(i => count(col(s"__t$i")).as(s"__n$i")): _*)
    val rows = steps.indices.map(i =>
      struct(lit(i + 1).as("step"), lit(steps(i)).as("event_type"),
        col(s"__n${i + 1}").as("n_users")))
    agg.select(col("__n1"), explode(array(rows: _*)).as("__s"))
      .select(col("__s.step").as("step"),
        col("__s.event_type").as("event_type"),
        col("__s.n_users").as("n_users"),
        when(col("__n1") > 0, TextAnalysis.round6(
          col("__s.n_users").cast("double") / col("__n1"))).as("conversion"))
  }

  /** Per-group ORDINARY LEAST SQUARES line fit — slope/intercept/R² of
    * y on x for every group in ONE keyed aggregation (the trend-line
    * staple: metric drift per segment, rate-over-time per entity).
    * Engine-exact in the house style: inputs snap to the 1e-6 grid, the
    * five moments (Σx, Σy, Σx², Σy², Σxy) accumulate in exact DECIMAL so
    * partial-agg order can't move them, and the closed forms
    * slope = (n·Σxy − Σx·Σy)/(n·Σx² − Σx²), intercept = (Σy − slope·Σx)/n,
    * R² = (n·Σxy − Σx·Σy)² / ((n·Σx² − Σx²)(n·Σy² − Σy²))
    * evaluate in a fixed double-op order both engines reproduce. NULL
    * x/y rows drop; slope/intercept are NULL for a zero-x-variance
    * group, R² additionally NULL for zero y-variance. Output: group
    * cols + (n, slope, intercept, r2), 6-dec snapped.
    */
  def groupedLinFit(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupedLinFit: need at least one group column")
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(
        TextAnalysis.round6(col(xCol).cast("double")).as("__x"),
        TextAnalysis.round6(col(yCol).cast("double")).as("__y")): _*)
    val agg = base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(38,6)")).as("__sx"),
        sum(col("__y").cast("decimal(38,6)")).as("__sy"),
        sum((col("__x") * col("__x")).cast("decimal(38,12)")).as("__sxx"),
        sum((col("__y") * col("__y")).cast("decimal(38,12)")).as("__syy"),
        sum((col("__x") * col("__y")).cast("decimal(38,12)")).as("__sxy"))
    val n = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double")
    val syy = col("__syy").cast("double")
    val sxy = col("__sxy").cast("double")
    val covN = n * sxy - sx * sy
    val varXN = n * sxx - sx * sx
    val varYN = n * syy - sy * sy
    agg.select(groupCols.map(col) ++ Seq(
      col("n"),
      when(varXN > 0, TextAnalysis.round6(covN / varXN)).as("slope"),
      when(varXN > 0, TextAnalysis.round6(
        (sy - (covN / varXN) * sx) / n)).as("intercept"),
      when(varXN > 0 && varYN > 0, TextAnalysis.round6(
        covN * covN / (varXN * varYN))).as("r2")): _*)
  }

  /** THETA-SKETCH SET ALGEBRA — distinct-cardinality estimates for the
    * UNION, INTERSECTION, and per-side counts of two key sets, plus the
    * Jaccard estimate, without ever shuffling the full key streams. Both
    * sides keep only keys whose uniform 32-bit hash falls below 2^32/θ⁻¹
    * (the SAME salt → the same retained subspace, which is what makes
    * the set algebra valid: a key survives on either side iff it
    * survives on both), the survivors merge in ONE keyed aggregation
    * carrying two membership bits, and every estimate is survivor-count
    * × θ⁻¹ — exact integer arithmetic end to end, like [[thetaDistinct]].
    *
    * Scale shape: the hash filters are stateless codegen'd predicates
    * that drop (θ⁻¹-1)/θ⁻¹ of each side BEFORE the one shuffle; the
    * estimate error is ~sqrt(θ⁻¹/n) relative. Output: one row
    * (sampled_a/b/intersection/union, est_a/b/intersection/union,
    * jaccard_est 6-dec snapped, NULL when the sampled union is empty).
    */
  def thetaSetOps(a: DataFrame, b: DataFrame, keyCol: String,
      thetaInverse: Int, salt: String = "theta"): DataFrame = {
    require(thetaInverse >= 1,
      s"thetaSetOps: thetaInverse must be >= 1, got $thetaInverse")
    val cut = math.round(4294967296.0 / thetaInverse)
    def side(df: DataFrame, tag: Int) = df
      .filter(Sampling.keyHash32(col(keyCol), salt) < cut)
      .select(col(keyCol).cast("string").as("__k"), lit(tag).as("__s"))
    val merged = side(a, 0).unionByName(side(b, 1))
      .groupBy(col("__k"))
      .agg(max(when(col("__s") === 0, 1L).otherwise(0L)).as("__ia"),
        max(when(col("__s") === 1, 1L).otherwise(0L)).as("__ib"))
    merged.agg(
      sum(col("__ia")).as("sampled_a"),
      sum(col("__ib")).as("sampled_b"),
      sum(col("__ia") * col("__ib")).as("sampled_intersection"),
      count(lit(1L)).as("sampled_union"))
      .select(
        coalesce(col("sampled_a"), lit(0L)).as("sampled_a"),
        coalesce(col("sampled_b"), lit(0L)).as("sampled_b"),
        coalesce(col("sampled_intersection"), lit(0L)).as("sampled_intersection"),
        col("sampled_union"))
      .select(col("*"),
        (col("sampled_a") * thetaInverse.toLong).as("est_a"),
        (col("sampled_b") * thetaInverse.toLong).as("est_b"),
        (col("sampled_intersection") * thetaInverse.toLong).as("est_intersection"),
        (col("sampled_union") * thetaInverse.toLong).as("est_union"),
        when(col("sampled_union") > 0, TextAnalysis.round6(
          col("sampled_intersection").cast("double") / col("sampled_union")))
          .as("jaccard_est"))
  }

  /** WINDOWED FUNNEL over an integral (ns-contract) ts column — the
    * ClickHouse-windowFunnel semantics: a user reaches step k iff SOME
    * chain exists where step 1 anchors at one of their step-1 events,
    * each later step is strictly after the previous, and the WHOLE chain
    * fits inside `(t1, t1 + window]`. Unlike [[funnelSteps]]'s unwindowed
    * form, greedy-from-the-earliest-anchor is not exact here — a later
    * step-1 event may open the window that completes the chain — so the
    * search anchors at EVERY step-1 event. Given an anchor, taking each
    * step's earliest qualifying event is optimal (more room for the
    * rest), so per anchor the chain is still one keyed min per step.
    *
    * Scale shape: the anchor frame is keyed (user, t1) — per-user cost
    * is (step-1 events) × (per-step events), all through keyed joins on
    * the user, never a global window or per-user sequence collect. The
    * per-step reach counts fold in ONE aggregation (distinct users with
    * a completing anchor). Output: (step, event_type, n_users,
    * conversion vs step 1, 6-dec snapped, NULL when step 1 is empty).
    */
  def funnelWindow(ev: DataFrame, userCol: String, tsCol: String,
      eventCol: String, steps: Seq[String], window: Long): DataFrame = {
    require(steps.nonEmpty, "funnelWindow: need at least one step")
    require(steps.distinct.length == steps.length,
      s"funnelWindow: steps must be distinct, got $steps")
    require(window > 0, s"funnelWindow: window must be > 0, got $window")
    def slice(t: String) = ev.filter(col(eventCol) === lit(t))
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
    var acc = slice(steps.head)
      .select(col("__u"), col("__ts").as("__t1")).distinct()
    for (i <- 2 to steps.length) {
      val next = slice(steps(i - 1)).select(col("__u").as("__u2"), col("__ts"))
      acc = acc.join(next,
          col("__u") === col("__u2") &&
            col("__ts") > col(s"__t${i - 1}") &&
            col("__ts") <= col("__t1") + lit(window),
          "left")
        .groupBy(acc.columns.map(col): _*)
        .agg(min(col("__ts")).as(s"__t$i"))
    }
    val agg = acc.agg(
      count_distinct(col("__u")).as("__n1"),
      (2 to steps.length).map(i =>
        count_distinct(when(col(s"__t$i").isNotNull, col("__u")))
          .as(s"__n$i")): _*)
    val rows = steps.indices.map(i =>
      struct(lit(i + 1).as("step"), lit(steps(i)).as("event_type"),
        col(s"__n${i + 1}").as("n_users")))
    agg.select(col("__n1"), explode(array(rows: _*)).as("__s"))
      .select(col("__s.step").as("step"),
        col("__s.event_type").as("event_type"),
        col("__s.n_users").as("n_users"),
        when(col("__n1") > 0, TextAnalysis.round6(
          col("__s.n_users").cast("double") / col("__n1"))).as("conversion"))
  }

  /** RETENTION CURVE over arbitrary (user, ts) columns — per (cohort
    * week, week offset), the fraction of the cohort still active. A
    * user's cohort is the epoch week (ts seconds integrally divided by
    * 604800; pre-epoch timestamps would shift a bucket — same caveat as
    * DuckDB's floor-dividing `//` only for negative epochs) of their
    * FIRST event; offset-0 retention is 1.0 by construction.
    *
    * Scale shape: project to distinct (user, week) pairs first (the only
    * state that matters — a user's duplicate events within a week
    * collapse before any join), one keyed min for the cohort, one keyed
    * join + count for the activity matrix, and the per-cohort sizes (one
    * row per cohort) broadcast back for the ratio. The fixed-schema
    * ns-long count-matrix twin is
    * [[graft.streaming.EventStream.retentionCohorts]]. `tsCol` may be a
    * TIMESTAMP (epoch seconds via unix_timestamp) or an integral column,
    * which is read under the repo-wide ns-since-epoch contract
    * ([[graft.Tables.eventsWithTs]]).
    * Output: (cohort_week, week_offset, n_users, retention), retention
    * 6-dec snapped.
    */
  def retentionCohorts(ev: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, IntegerType, TimestampType}
    def idiv(a: org.apache.spark.sql.Column, b: Long) =
      org.apache.spark.sql.graftbridge.Bridge.integralDivide(a, lit(b))
    val secs = ev.schema(tsCol).dataType match {
      case TimestampType => unix_timestamp(col(tsCol))
      case LongType | IntegerType => idiv(col(tsCol), 1000000000L)
      case dt => throw new IllegalArgumentException(
        s"retentionCohorts: ts column $tsCol must be TIMESTAMP or integral ns, got $dt")
    }
    val weeks = ev.select(col(userCol).as("__u"),
        idiv(secs, 604800L).as("__w"))
      .distinct()
    val cohort = weeks.groupBy(col("__u")).agg(min(col("__w")).as("cohort_week"))
    val act = weeks.join(cohort, Seq("__u"))
      .groupBy(col("cohort_week"),
        (col("__w") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1L)).as("n_users"))
    val size = cohort.groupBy(col("cohort_week"))
      .agg(count(lit(1L)).as("__size"))
    act.join(broadcast(size), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        TextAnalysis.round6(
          col("n_users").cast("double") / col("__size")).as("retention"))
  }

}
