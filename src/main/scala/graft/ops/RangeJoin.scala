package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Interval overlap join (the "range join"): all (left, right) pairs whose
  * CLOSED intervals overlap — `l.start <= r.end && r.start <= l.end` —
  * optionally per key. Spark's built-in answer to a range predicate is a
  * product + filter (BroadcastNestedLoopJoin / CartesianProduct), which is
  * the classic big-big scale killer; the standard distributed form bins
  * the number line:
  *
  *   - each interval explodes to the bins it covers (`binSize`-wide,
  *     integral division — bounded by interval length / binSize);
  *   - candidate pairs meet through an EQUI-join on (key..., bin);
  *   - the exact predicate filters, and each surviving pair is kept only
  *     in the bin containing `greatest(l.start, r.start)` (the overlap
  *     start) — that bin lies in both intervals' bin ranges and is unique,
  *     so every pair is emitted EXACTLY once with no distinct pass.
  *
  * Pick `binSize` near the typical interval length: too small explodes
  * rows, too large degrades selectivity (same tuning as the spatial grid
  * join in [[SpatialJoin]], which is this operator in 2D).
  *
  * Output: every left column plus every non-key right column prefixed
  * `rightPrefix`. Inner-join semantics (non-overlapping rows drop).
  */
object RangeJoin {

  def overlapJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binSize: Long, rightPrefix: String = "r_"): DataFrame = {
    require(binSize > 0, s"overlapJoin: binSize must be positive, got $binSize")
    val prefixed = right.columns.filterNot(keyCols.contains).map(rightPrefix + _)
    val clash = prefixed.toSet intersect left.columns.toSet
    require(clash.isEmpty,
      s"overlapJoin: prefixed right columns clash with left columns: $clash — " +
        "pick a different rightPrefix")
    val r = right.columns.foldLeft(right)((df, c) =>
      if (keyCols.contains(c)) df else df.withColumnRenamed(c, rightPrefix + c))
    val rS = rightPrefix + rStart
    val rE = rightPrefix + rEnd
    def bins(s: String, e: String) =
      explode(sequence(Bridge.integralDivide(col(s), lit(binSize)),
        Bridge.integralDivide(col(e), lit(binSize))))
    // degenerate (end < start) intervals can never overlap anything — and
    // would make the bin sequence descend — so they drop here
    val lBinned = left.filter(col(lEnd) >= col(lStart))
      .withColumn("__bin", bins(lStart, lEnd))
    val rBinned = r.filter(col(rE) >= col(rS))
      .withColumn("__bin", bins(rS, rE))
    lBinned.join(rBinned, keyCols :+ "__bin")
      .filter(col(lStart) <= col(rE) && col(rS) <= col(lEnd))
      .filter(col("__bin") ===
        Bridge.integralDivide(greatest(col(lStart), col(rS)), lit(binSize)))
      .drop("__bin")
  }

  /** Point-in-interval join — the degenerate-but-dominant special case of
    * [[overlapJoin]] (IP→geo range lookup, timestamp→price epoch,
    * value→bucket assignment): every point row joined to the interval rows
    * whose CLOSED interval `[start, end]` contains it, optionally per key.
    *
    * Same binning scheme, but the POINT side explodes to exactly ONE bin,
    * so a (point, interval) pair can meet in only one bin and pair-once
    * emission is automatic — no overlap-start dedup filter needed. The
    * interval side still explodes to its covered bins (bounded by interval
    * length / binSize). Inner semantics; degenerate intervals drop.
    *
    * Output: every point column plus every non-key interval column
    * prefixed `rightPrefix`.
    */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], pCol: String, rStart: String, rEnd: String,
      binSize: Long, rightPrefix: String = "r_"): DataFrame = {
    require(binSize > 0, s"pointInIntervalJoin: binSize must be positive, got $binSize")
    val prefixed = intervals.columns.filterNot(keyCols.contains).map(rightPrefix + _)
    val clash = prefixed.toSet intersect points.columns.toSet
    require(clash.isEmpty,
      s"pointInIntervalJoin: prefixed interval columns clash with point columns: " +
        s"$clash — pick a different rightPrefix")
    val r = intervals.columns.foldLeft(intervals)((df, c) =>
      if (keyCols.contains(c)) df else df.withColumnRenamed(c, rightPrefix + c))
    val rS = rightPrefix + rStart
    val rE = rightPrefix + rEnd
    val pBinned = points
      .withColumn("__bin", Bridge.integralDivide(col(pCol), lit(binSize)))
    val rBinned = r.filter(col(rE) >= col(rS))
      .withColumn("__bin", explode(sequence(
        Bridge.integralDivide(col(rS), lit(binSize)),
        Bridge.integralDivide(col(rE), lit(binSize)))))
    pBinned.join(rBinned, keyCols :+ "__bin")
      .filter(col(pCol) >= col(rS) && col(pCol) <= col(rE))
      .drop("__bin")
  }

  /** Merge overlapping/touching intervals per key into maximal disjoint
    * spans (gaps-and-islands) — coverage consolidation: activity windows,
    * redacted spans, on-call shifts, genomic/region coverage. An interval
    * starts a new island iff its start exceeds the running max end of
    * everything before it (per key, start order); islands then aggregate
    * to (min start, max end, n). Two per-KEY windows + one keyed
    * aggregation — state is one running max per key, the window never
    * spans keys, and a key's cost is its own interval count. Touching
    * intervals ([1,3] and [3,5], or [1,2] and [3,4] with `gap = 1` on an
    * integer domain) merge when their separation is <= `gap` (default 0 =
    * strict overlap/touch only).
    * Output: key columns + (start, end, n_merged).
    */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String], startCol: String,
      endCol: String, gap: Long = 0L): DataFrame = {
    require(gap >= 0, s"mergeIntervals: gap must be >= 0, got $gap")
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    val runMax = max(col(endCol)).over(
      ord.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df
      .filter(col(startCol) <= col(endCol))
      .withColumn("__new", when(runMax.isNull ||
        col(startCol) > runMax + gap, lit(1)).otherwise(lit(0)))
      .withColumn("__island", sum(col("__new")).over(
        ord.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy((keyCols :+ "__island").map(col): _*)
      .agg(min(col(startCol)).as("start"), max(col(endCol)).as("end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }
}
