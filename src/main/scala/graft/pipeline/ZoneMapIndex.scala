package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest ZONE MAP sidecar — the RANGE twin of [[BloomIndex]] (equality):
  * per-partition (min, max, nulls) stats for chosen VALUE columns beside a
  * layout partitioned by something else entirely. Parquet already keeps
  * row-group min/max INSIDE each file; the sidecar lifts the same idea to
  * the partition level so range-query planning reads O(partitions·columns)
  * sidecar rows and skips whole directories before a single footer is
  * opened — at 100 TB the difference between "list and open every file's
  * footer" and "scan three of five hundred partitions".
  *
  * Results are EXACT: a partition is skipped only when [lo, hi] cannot
  * intersect its [min, max] (NULL-only partitions match nothing — SQL
  * range predicates never select NULL), and the exact predicate still
  * runs over the scanned partitions. Stats are per (partition, column) —
  * one aggregation at write time, mergeable by min/min + max/max on
  * append. Sidecar bounds travel as strings and re-cast for numeric
  * comparisons: exact while values are double-representable (integers up
  * to 2^53); beyond that, index a string-ordered key instead — a rounded
  * bound could otherwise skip a boundary partition.
  */
object ZoneMapIndex {

  /** Write `df` partitioned by `partCol` with a `_zonemap` sidecar of
    * per-partition (min, max, non-null count) for each of `statCols`
    * (numeric or string — anything with a total order).
    */
  def writeZoneMapped(df: DataFrame, path: String, partCol: String,
      statCols: Seq[String]): Unit = {
    require(statCols.nonEmpty, "writeZoneMapped: need at least one stat column")
    require(!statCols.contains(partCol),
      s"writeZoneMapped: '$partCol' partitions the layout; zone stats on it are vacuous")
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)
    val stats = statCols.map { c =>
      df.groupBy(col(partCol).as("part"))
        .agg(min(col(c)).cast("string").as("lo"),
          max(col(c)).cast("string").as("hi"),
          count(col(c)).as("n_notnull"))
        .withColumn("column", lit(c))
    }.reduce(_.unionByName(_))
    stats.coalesce(1).write.mode("overwrite").parquet(s"$path/_zonemap")
    df.sparkSession.createDataFrame(Seq((partCol, statCols.mkString(","))))
      .toDF("partCol", "statCols")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_zonemap_meta")
  }

  /** Sidecar metadata (None for a plain layout). */
  def readMeta(spark: SparkSession, path: String): Option[(String, Seq[String])] =
    try {
      val r = spark.read.parquet(s"$path/_zonemap_meta").collect().head
      Some((r.getAs[String]("partCol"), r.getAs[String]("statCols").split(",").toSeq))
    } catch { case _: Exception => None }

  /** EXACT range read `lo <= col <= hi` through the zone map: candidate
    * partitions are those whose [min, max] intersects [lo, hi] (an
    * O(partitions) filter over the tiny sidecar, collected as a planning
    * handoff), then one scan with the partition list in PartitionFilters
    * and the exact range predicate pushed to the row groups. Values
    * compare through their STRING form in the sidecar — exact for string
    * columns; for numeric columns pass `numeric = true` (the default) so
    * bounds re-cast to double for the comparison.
    */
  def readRange(spark: SparkSession, path: String, valueCol: String,
      lo: Any, hi: Any, numeric: Boolean = true): DataFrame = {
    val (partCol, statCols) = readMeta(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"readRange: no _zonemap_meta under $path — write with writeZoneMapped"))
    require(statCols.contains(valueCol),
      s"readRange: '$valueCol' has no zone stats (have: $statCols)")
    val side = spark.read.parquet(s"$path/_zonemap")
      .filter(col("column") === valueCol && col("n_notnull") > 0)
    val (sLo, sHi) = if (numeric)
      (col("lo").cast("double"), col("hi").cast("double")) else (col("lo"), col("hi"))
    val (qLo, qHi) = if (numeric)
      (lit(lo).cast("double"), lit(hi).cast("double")) else (lit(lo), lit(hi))
    val cand = side.filter(sLo <= qHi && sHi >= qLo)
      .select(col("part")).distinct().collect().map(_.get(0))
    val data = spark.read.parquet(path)
    if (cand.isEmpty) data.filter(org.apache.spark.sql.functions.lit(false))
    else data.filter(col(partCol).isin(cand: _*) &&
      col(valueCol) >= lit(lo) && col(valueCol) <= lit(hi))
  }
}
