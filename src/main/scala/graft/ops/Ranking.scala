package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global ordinal rank WITHOUT a corpus-wide window — the scalable
  * `row_number() OVER (ORDER BY ...)`.
  *
  * A bare global window funnels the whole table through ONE reducer (the
  * empty partition spec); at 100 TB that is the job. This is the classic
  * two-phase form instead: range-partition on the sort key (Spark's
  * RangePartitioner — the same machinery ORDER BY uses, seeded sampling,
  * deterministic for a given input), count rows per range (an O(partitions)
  * driver handoff — the only thing the driver ever holds), then each range
  * ranks ITSELF in parallel and adds its exclusive prefix offset. Every
  * range costs its own row count; no single-reducer stage exists.
  *
  * Determinism contract: ranks are a pure function of the total order, so
  * `sortCols` MUST reach a unique key (append the row id as the final
  * tiebreaker) — with duplicate sort keys the ranks WITHIN a tie group
  * follow arrival order and are not reproducible. The range-shuffled
  * input is materialized ONCE via eager localCheckpoint: the per-range
  * offsets are baked from that materialization, and a releasable cache
  * here was a correctness race — a post-release action re-sampled range
  * boundaries against the stale offsets and silently corrupted ranks.
  */
object Ranking {

  /** Append `rankCol` = dense global ordinal (0-based) under the total
    * order `sortCols` (ascending, NULLS FIRST — Spark's default; include a
    * unique tiebreaker). `partitions` 0 = the session's shuffle
    * parallelism.
    */
  def globalRank(df: DataFrame, sortCols: Seq[String],
      rankCol: String = "rank", partitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "globalRank: need at least one sort column")
    require(!df.columns.contains(rankCol),
      s"globalRank: output column '$rankCol' already exists")
    val spark = df.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val keys = sortCols.map(col)
    // __pid is materialized ONCE via eager localCheckpoint — not a
    // releasable cache. The per-range offsets below are BAKED from this
    // materialization; if a later action recomputed the range shuffle,
    // RangePartitioner would RESAMPLE boundaries (its seed varies with
    // the rebuilt RDD id) against the stale offsets and silently corrupt
    // ranks — observed as run-to-run row drift in SNM blocking before
    // truncation. Checkpoint blocks are reclaimed by the context cleaner
    // once the frame is unreferenced.
    val sorted = df.repartitionByRange(p, keys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = sorted.groupBy(col("__pid")).count()
      .as[(Int, Long)].collect().toMap // O(partitions) handoff
    val offsets = (0 until p).scanLeft(0L) { (acc, pid) =>
      acc + counts.getOrElse(pid, 0L)
    }
    val offDf = (0 until p).map(pid => (pid, offsets(pid))).toDF("__pid", "__off")
    val out = sorted
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn(rankCol,
        row_number().over(
          Window.partitionBy(col("__pid")).orderBy(keys: _*))
          .cast("long") + col("__off") - 1L)
      .drop("__pid", "__off")
    out
  }

  /** 2-D SKYLINE (Pareto frontier, maximize both axes) — the multi-
    * criteria selection operator Spark has no word for: keep exactly the
    * rows no other row dominates (≥ on both axes, > on at least one).
    * The curation shape: "the quality-vs-brevity frontier", "best score
    * at every recency level" — a top-k on any single blend misses corners
    * the frontier keeps.
    *
    * NO corpus-wide window and NO pairwise dominance join: (1) one keyed
    * agg collapses to the per-x maximum (only the per-x best y can be on
    * the frontier; same-x duplicates of that y rejoin at the end — equal
    * points don't dominate each other); (2) the classic sort-scan
    * ("y must beat every y at strictly larger x") runs as the
    * [[globalRank]] two-phase: range-partition the per-x maxima on x
    * DESCENDING, cummax WITHIN each range, and the cross-range carry-in
    * is an O(partitions) driver handoff of per-range maxima; (3) one
    * equi-join back on x. Rows with NULL on either axis drop (NULL is
    * unrankable). The per-x maxima materialize once (eager
    * localCheckpoint — see [[globalRank]] on why a releasable cache
    * would be a rank-corruption race).
    * Output: the dominating input rows, schema unchanged.
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val base = df.filter(x.isNotNull && y.isNotNull)
    val mx = base.groupBy(x.as("__x")).agg(max(y).as("__ymax"))
    // eager localCheckpoint, same reason as [[globalRank]]: the carry-in
    // below is baked from THIS materialization's partition ids; a
    // recompute would resample range boundaries against stale carries
    val sorted = mx.repartitionByRange(p, col("__x").desc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // per-range maxima -> strict prefix carry-in per range (O(p) handoff)
    val rangeMax = sorted.groupBy(col("__pid")).agg(max(col("__ymax")))
      .as[(Int, Double)].collect().toMap
    val carry = (0 until p).scanLeft(Double.NegativeInfinity) { (acc, pid) =>
      math.max(acc, rangeMax.getOrElse(pid, Double.NegativeInfinity))
    }
    val carryDf = (0 until p).map(pid => (pid, carry(pid))).toDF("__pid", "__carry")
    val wPrev = Window.partitionBy(col("__pid")).orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierX = sorted
      .join(broadcast(carryDf), Seq("__pid"))
      .withColumn("__before",
        greatest(coalesce(max(col("__ymax")).over(wPrev),
          lit(Double.NegativeInfinity)), col("__carry")))
      .filter(col("__ymax") > col("__before"))
      .select(col("__x"), col("__ymax"))
    val out = base.join(frontierX,
      x === col("__x") && y === col("__ymax"))
      .drop("__x", "__ymax")
    out
  }
}
