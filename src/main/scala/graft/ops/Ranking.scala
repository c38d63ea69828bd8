package graft.ops

import graft.pipeline.CacheScope
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
  * follow arrival order and are not reproducible. The ranked input is
  * internally persisted (both the count job and the output read it) and
  * released after the caller's first action via [[CacheScope]]; callers
  * running multiple actions over the result should persist it themselves.
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
    // __pid is materialized INTO the cache, so the count job and the
    // output read identical partition ids (no re-sample drift)
    val sorted = df.repartitionByRange(p, keys: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
    CacheScope.releaseAfterFirstUse(out, Seq(sorted))
    out
  }
}
