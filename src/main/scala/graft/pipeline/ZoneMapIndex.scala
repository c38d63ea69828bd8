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
    // cluster by the partition column first: an unclustered dynamic-
    // partition write opens one file per (task, partition value) — tasks x
    // values tiny files; clustered, each value is written by one task
    df.repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(path)
    sidecarStats(df, partCol, statCols)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_zonemap")
    df.sparkSession.createDataFrame(Seq((partCol, statCols.mkString(","))))
      .toDF("partCol", "statCols")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_zonemap_meta")
  }

  /** Per-(partition, column) stats rows: string-ordered AND double-typed
    * bounds both travel so merges stay type-correct (string min over
    * numeric strings would order "10" < "9").
    */
  private def sidecarStats(df: DataFrame, partCol: String,
      statCols: Seq[String]): DataFrame =
    statCols.map { c =>
      df.groupBy(col(partCol).as("part"))
        .agg(min(col(c)).cast("string").as("lo"),
          max(col(c)).cast("string").as("hi"),
          min(expr(s"try_cast(`$c` AS DOUBLE)")).as("lo_d"),
          max(expr(s"try_cast(`$c` AS DOUBLE)")).as("hi_d"),
          count(col(c)).as("n_notnull"))
        .withColumn("column", lit(c))
    }.reduce(_.unionByName(_))

  /** INCREMENTAL append: new data lands in the partitioned layout, the
    * sidecar merges arithmetically — min/min, max/max, count-add per
    * (partition, column) — so append == rebuild without rescanning the
    * resident data (the mergeability zone maps exist for). The merged
    * sidecar rewrites via a sibling temp dir + rename.
    */
  def appendZoneMapped(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val (partCol, statCols) = readMeta(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"appendZoneMapped: no _zonemap_meta under $path"))
    df.repartition(col(partCol)) // one task per partition value — see write
      .write.mode("append").partitionBy(partCol).parquet(path)
    val merged = spark.read.parquet(s"$path/_zonemap")
      .unionByName(sidecarStats(df, partCol, statCols))
      .groupBy(col("part"), col("column"))
      .agg(min(col("lo")).as("lo"), max(col("hi")).as("hi"),
        min(col("lo_d")).as("lo_d"), max(col("hi_d")).as("hi_d"),
        sum(col("n_notnull")).as("n_notnull"))
    val tmp = s"$path/_zonemap__merging"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_zonemap"), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(s"$path/_zonemap"))
    ()
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
      (col("lo_d"), col("hi_d")) else (col("lo"), col("hi"))
    val (qLo, qHi) = if (numeric)
      (lit(lo).cast("double"), lit(hi).cast("double")) else (lit(lo), lit(hi))
    val cand = side.filter(sLo <= qHi && sHi >= qLo)
      .select(col("part")).distinct().collect().map(_.get(0))
    val data = spark.read.parquet(path)
    if (cand.isEmpty) data.filter(org.apache.spark.sql.functions.lit(false))
    else data.filter(col(partCol).isin(cand: _*) &&
      col(valueCol) >= lit(lo) && col(valueCol) <= lit(hi))
  }

  /** EXACT CONJUNCTIVE multi-range read (`lo <= col <= hi` for EVERY
    * bound): a candidate partition must intersect every column's range —
    * per-column reads would UNION, not intersect, and the 2D/3D crop
    * shape ([[graft.ops.TileLayout]]'s (scale, tile_y, tile_x)) needs
    * the conjunction. One sidecar scan per column (O(partitions) rows —
    * a planning handoff, like Z-order's key bands), then one data scan
    * with the intersected partition list in PartitionFilters and all
    * exact range predicates pushed to the row groups.
    */
  def readRanges(spark: SparkSession, path: String,
      bounds: Seq[(String, Any, Any)], numeric: Boolean = true): DataFrame = {
    require(bounds.nonEmpty, "readRanges: need at least one (col, lo, hi)")
    val (partCol, statCols) = readMeta(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"readRanges: no _zonemap_meta under $path — write with writeZoneMapped"))
    bounds.foreach { case (c, _, _) => require(statCols.contains(c),
      s"readRanges: '$c' has no zone stats (have: $statCols)") }
    val side = spark.read.parquet(s"$path/_zonemap")
    val cand = bounds.map { case (c, lo, hi) =>
      val s = side.filter(col("column") === c && col("n_notnull") > 0)
      val (sLo, sHi) = if (numeric)
        (col("lo_d"), col("hi_d")) else (col("lo"), col("hi"))
      val (qLo, qHi) = if (numeric)
        (lit(lo).cast("double"), lit(hi).cast("double")) else (lit(lo), lit(hi))
      s.filter(sLo <= qHi && sHi >= qLo)
        .select(col("part")).distinct().collect().map(_.get(0)).toSet
    }.reduce(_ intersect _).toSeq
    val data = spark.read.parquet(path)
    if (cand.isEmpty) data.filter(org.apache.spark.sql.functions.lit(false))
    else bounds.foldLeft(data.filter(col(partCol).isin(cand: _*))) {
      case (d, (c, lo, hi)) =>
        d.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
    }
  }
}
