package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for spatial data at rest — the data-layout
  * lever that makes 100 TB bounding-box queries cheap: interleaving the
  * quantized x/y bits gives a 1-D sort key under which spatially-near
  * points land in the same parquet row groups, so a bbox query prunes to
  * a handful of key ranges (row-group min/max + pushed filters) instead
  * of scanning the world. The reference keeps points in spatially-naive
  * parquet (io_points.py) and relies on in-memory dask masks; a
  * cluster-scale engine needs the at-rest layout itself to be spatial.
  *
  * Everything here is integer bit arithmetic on the 2^bits quantization
  * grid — deterministic on any engine (the q201 oracle recomputes keys in
  * SQL), and the key column is a plain LONG: no custom file format, no
  * index sidecar, any parquet reader benefits.
  */
object ZOrder {

  /** Quantize a coordinate to a `bits`-bit cell index over [lo, hi):
    * floor((v - lo) / cellWidth), clamped to [0, 2^bits - 1]. NULL-safe
    * (NULL coordinate -> NULL cell -> NULL key; filter upstream).
    */
  def quantize(v: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"quantize: bits must be in [1, 31], got $bits")
    require(hi > lo, s"quantize: need hi > lo, got [$lo, $hi]")
    least(greatest(floor((v.cast("double") - lo) / cellWidth(lo, hi, bits))
      .cast("long"), lit(0L)), lit(maxCell(bits)))
  }

  // the ONE definition of the grid: both the Column quantizer above and
  // the scalar planner below derive from these, so write- and read-side
  // cell math cannot drift
  private def maxCell(bits: Int): Long = (1L << bits) - 1
  private def cellWidth(lo: Double, hi: Double, bits: Int): Double =
    (hi - lo) / (1L << bits).toDouble

  /** Driver-side [[quantize]] — same floor/clamp algebra on scalars
    * (range planning in [[readBox]]/[[zRangesForBoxes]]).
    */
  private[graft] def quantizeScalar(v: Double, lo: Double, hi: Double,
      bits: Int): Long =
    math.min(math.max(math.floor((v - lo) / cellWidth(lo, hi, bits)).toLong, 0L),
      maxCell(bits))

  /** Interleave two `bits`-bit cell indices into the Morton key:
    * bit i of qx -> key bit 2i, bit i of qy -> key bit 2i+1. Pure
    * shift/mask algebra — whole-stage codegen, one expression tree, and
    * exactly mirrorable in SQL (the q201 oracle's list_sum form).
    */
  def interleave(qx: Column, qy: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"interleave: bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(qx, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(qy, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** [[quantize]] + [[interleave]] in one call over raw coordinates. */
  def zorderKey(x: Column, y: Column, xmin: Double, xmax: Double,
      ymin: Double, ymax: Double, bits: Int = 16): Column =
    interleave(quantize(x, xmin, xmax, bits), quantize(y, ymin, ymax, bits), bits)

  /** 3-D Morton key: bit i of qx -> key bit 3i, qy -> 3i+1, qz -> 3i+2
    * (`bits` <= 21 keeps the 3·bits-wide key positive in a long) — the
    * volumetric twin of [[interleave]] for z-stack rasters and 3-D point
    * clouds (the container's (z, y, x) elements), or (x, y, t)
    * spatiotemporal clustering. Same pure shift/mask algebra.
    */
  def interleave3(qx: Column, qy: Column, qz: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 21, s"interleave3: bits must be in [1, 21], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(qx, i).bitwiseAND(lit(1L)), 3 * i) +
        shiftleft(shiftright(qy, i).bitwiseAND(lit(1L)), 3 * i + 1) +
        shiftleft(shiftright(qz, i).bitwiseAND(lit(1L)), 3 * i + 2)
    }.reduce(_ + _)
  }

  /** [[quantize]] + [[interleave3]] over raw 3-D coordinates. */
  def zorderKey3(x: Column, y: Column, z: Column,
      xmin: Double, xmax: Double, ymin: Double, ymax: Double,
      zmin: Double, zmax: Double, bits: Int = 10): Column =
    interleave3(quantize(x, xmin, xmax, bits), quantize(y, ymin, ymax, bits),
      quantize(z, zmin, zmax, bits), bits)

  /** Driver-side [[interleave3]] (planning / spec cross-check). */
  private[graft] def morton3(qx: Long, qy: Long, qz: Long, bits: Int): Long = {
    var k = 0L; var i = 0
    while (i < bits) {
      k |= ((qx >> i) & 1L) << (3 * i)
      k |= ((qy >> i) & 1L) << (3 * i + 1)
      k |= ((qz >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    k
  }

  /** Driver-side Morton key for range planning (same algebra as
    * [[interleave]], on longs).
    */
  private[graft] def morton(qx: Long, qy: Long, bits: Int): Long = {
    var k = 0L; var i = 0
    while (i < bits) {
      k |= ((qx >> i) & 1L) << (2 * i)
      k |= ((qy >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    k
  }

  /** Write `df` clustered by Morton key: range-partition on the key (so
    * file N holds a contiguous key band) and sort within partitions (so
    * row-group min/max stats are tight). The key column persists in the
    * output — the handle every later range prune filters on. `extent`
    * is the quantization frame; pass the known data extent (metadata, a
    * prior [[graft.ops.Aggregate]] extent, or a domain constant) — it
    * must match what queries use.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, path: String,
      xmin: Double, xmax: Double, ymin: Double, ymax: Double,
      bits: Int = 16, keyCol: String = "zkey",
      numPartitions: Option[Int] = None): Unit = {
    require(!df.columns.contains(keyCol),
      s"writeZOrdered: key column '$keyCol' collides with an input column")
    val keyed = df.withColumn(keyCol,
      zorderKey(col(xCol), col(yCol), xmin, xmax, ymin, ymax, bits))
    val parted = numPartitions match {
      case Some(n) => keyed.repartitionByRange(n, col(keyCol))
      case None => keyed.repartitionByRange(col(keyCol))
    }
    parted.sortWithinPartitions(col(keyCol))
      .write.mode("overwrite").parquet(path)
    // persist the layout parameters next to the data (underscore-prefixed
    // subdir — invisible to parquet readers of `path`) so readers can
    // validate or self-configure instead of silently assuming the write-
    // time (bits, extent)
    df.sparkSession.createDataFrame(Seq(
        (xCol, yCol, keyCol, bits, xmin, xmax, ymin, ymax)))
      .toDF("xCol", "yCol", "keyCol", "bits", "xmin", "xmax", "ymin", "ymax")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_zorder_meta")
  }

  /** Layout parameters of a [[writeZOrdered]] dataset. */
  final case class ZOrderMeta(xCol: String, yCol: String, keyCol: String,
    bits: Int, xmin: Double, xmax: Double, ymin: Double, ymax: Double)

  /** Read the persisted layout parameters (None for pre-metadata layouts
    * or foreign z-ordered data).
    */
  def readMeta(spark: SparkSession, path: String): Option[ZOrderMeta] =
    try {
      val r = spark.read.parquet(s"$path/_zorder_meta")
        .select("xCol", "yCol", "keyCol", "bits", "xmin", "xmax", "ymin", "ymax")
        .collect().head
      Some(ZOrderMeta(r.getString(0), r.getString(1), r.getString(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    } catch { case _: Throwable => None }

  /** APPEND a batch into an existing [[writeZOrdered]] layout: key the
    * rows with the layout's persisted grid parameters and add key-sorted
    * files. Appended files are Morton-sorted internally but their key
    * bands OVERLAP the resident files', so row-group pruning degrades as
    * appends accumulate — run [[compact]] periodically to restore the
    * global clustering (the streaming ingest loop does this every N
    * batches). Correctness never degrades: [[readBox]]'s exact refine
    * doesn't care which file a row lives in.
    */
  def appendZOrdered(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val m = readMeta(spark, path).getOrElse(throw new IllegalArgumentException(
      s"appendZOrdered: no _zorder_meta under $path — initialize with writeZOrdered"))
    require(!df.columns.contains(m.keyCol),
      s"appendZOrdered: key column '${m.keyCol}' collides with an input column")
    df.withColumn(m.keyCol, zorderKey(col(m.xCol), col(m.yCol),
        m.xmin, m.xmax, m.ymin, m.ymax, m.bits))
      .sortWithinPartitions(col(m.keyCol))
      .write.mode("append").parquet(path)
  }

  /** COMPACT a layout that has absorbed appends: re-range-partition the
    * whole dataset on the key and rewrite, restoring one contiguous key
    * band per file (tight row-group min/max again). The rewrite goes to a
    * sibling temp directory first and swaps in with delete+rename — a
    * brief unavailability window a production deployment would close with
    * a table format's atomic manifest; the layout itself needs none.
    */
  def compact(spark: SparkSession, path: String,
      numPartitions: Option[Int] = None): Unit = {
    val m = readMeta(spark, path).getOrElse(throw new IllegalArgumentException(
      s"compact: no _zorder_meta under $path"))
    val tmp = s"${path}__compacting"
    val data = spark.read.parquet(path)
    val parted = numPartitions match {
      case Some(n) => data.repartitionByRange(n, col(m.keyCol))
      case None => data.repartitionByRange(col(m.keyCol))
    }
    parted.sortWithinPartitions(col(m.keyCol))
      .write.mode("overwrite").parquet(tmp)
    spark.createDataFrame(Seq(
        (m.xCol, m.yCol, m.keyCol, m.bits, m.xmin, m.xmax, m.ymin, m.ymax)))
      .toDF("xCol", "yCol", "keyCol", "bits", "xmin", "xmax", "ymin", "ymax")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/_zorder_meta")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
  }

  /** Per-FILE key bands of a Z-ordered layout: (file, min key, max key,
    * rows) — the raw material for clustering-quality monitoring. One
    * input_file_name() aggregation; O(files) rows.
    */
  def layoutStats(spark: SparkSession, path: String,
      keyCol: String = "zkey"): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"),
        count(lit(1)).as("rows"))

  /** CLUSTERING DEPTH of the layout: the maximum number of files whose
    * key bands overlap at any single key — the metric that schedules
    * compaction. A freshly written/compacted range-partitioned layout
    * has depth 1 (disjoint bands: every readBox range hits the minimum
    * file set); each streamed append layers another band on top, and a
    * probe may open up to `depth` files per range. Computed on the
    * driver over the O(files) stats rows via a sweep over band
    * endpoints (starts count +1, ends -1 after sort).
    */
  def clusteringDepth(spark: SparkSession, path: String,
      keyCol: String = "zkey"): Int = {
    val bands = layoutStats(spark, path, keyCol)
      .select(col("min_key").cast("long"), col("max_key").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (bands.isEmpty) 0
    else {
      // sweep: at equal coordinates starts come before ends (closed
      // intervals: [1,3] and [3,5] DO overlap at 3)
      val events = bands.flatMap { case (lo, hi) => Seq((lo, +1), (hi, -1)) }
        .sortBy { case (k, delta) => (k, -delta) }
      var depth = 0; var maxDepth = 0
      events.foreach { case (_, delta) =>
        depth += delta; if (depth > maxDepth) maxDepth = depth
      }
      maxDepth
    }
  }

  /** Covering Morton-key ranges for a bbox, planned at a coarser
    * `level` <= `bits`: the box's cell rectangle at `level` decomposes
    * into at most (2^level)^2 cells, each owning the contiguous key band
    * [morton(cell) << 2(bits-level), +4^(bits-level)); adjacent bands
    * merge. `level` trades range count (driver memory / filter width)
    * against prune tightness — 6-8 covers most boxes with a handful of
    * ranges. The ranges OVER-approximate the box (Z-curve cells at the
    * box edge contain outside points), so callers refine with the exact
    * coordinate predicate — the standard two-phase spatial scan.
    */
  def zRangesForBox(qx0: Long, qx1: Long, qy0: Long, qy1: Long,
      bits: Int, level: Int, maxCells: Int = 4096): Seq[(Long, Long)] = {
    require(level >= 1 && level <= bits,
      s"zRangesForBox: level must be in [1, bits=$bits], got $level")
    require(qx0 <= qx1 && qy0 <= qy1, "zRangesForBox: empty box")
    val drop = bits - level
    val (cx0, cx1) = (qx0 >> drop, qx1 >> drop)
    val (cy0, cy1) = (qy0 >> drop, qy1 >> drop)
    val nCells = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
    require(nCells <= maxCells,
      s"zRangesForBox: $nCells cover cells at level $level exceed $maxCells — lower the level")
    val span = 1L << (2 * drop)
    val bands = (for {
      cx <- cx0 to cx1
      cy <- cy0 to cy1
    } yield {
      val base = morton(cx, cy, level) << (2 * drop)
      (base, base + span - 1)
    }).sortBy(_._1)
    // merge adjacent/contiguous bands so the pushed filter stays narrow
    bands.foldLeft(List.empty[(Long, Long)]) {
      case ((lo, hi) :: rest, (l, h)) if l <= hi + 1 => (lo, math.max(hi, h)) :: rest
      case (acc, b) => b :: acc
    }.reverse
  }

  /** The two-phase bbox read over a [[writeZOrdered]] layout: coarse
    * Morton-range prune (pushes to the parquet scan's row-group stats)
    * then exact coordinate refine. Row-for-row equal to the plain bbox
    * filter over the full table — the ranges only change what gets READ.
    */
  def readBox(spark: SparkSession, path: String, xCol: String, yCol: String,
      x0: Double, x1: Double, y0: Double, y1: Double,
      xmin: Double, xmax: Double, ymin: Double, ymax: Double,
      bits: Int = 16, level: Int = 8, keyCol: String = "zkey"): DataFrame = {
    // refuse a silently-wrong prune: if the layout recorded its write-time
    // parameters, the caller's must agree (a bits/extent mismatch makes
    // the key math prune REAL rows)
    readMeta(spark, path).foreach { m =>
      require(m.bits == bits && m.keyCol == keyCol &&
        m.xmin == xmin && m.xmax == xmax && m.ymin == ymin && m.ymax == ymax,
        s"readBox: layout was written with $m but query assumes " +
          s"(bits=$bits, keyCol=$keyCol, extent=[$xmin,$xmax]x[$ymin,$ymax])")
    }
    coarseBoxPrune(spark, path, Seq((x0, x1, y0, y1)),
      xmin, xmax, ymin, ymax, bits, level, keyCol)
      .filter(col(xCol) >= x0 && col(xCol) <= x1 &&
        col(yCol) >= y0 && col(yCol) <= y1)
  }

  /** [[readBox]] with every layout parameter taken from the persisted
    * metadata — the call that CANNOT mismatch the write.
    */
  def readBox(spark: SparkSession, path: String,
      x0: Double, x1: Double, y0: Double, y1: Double, level: Int): DataFrame = {
    val m = readMeta(spark, path).getOrElse(throw new IllegalArgumentException(
      s"readBox: no _zorder_meta under $path — pass the layout parameters explicitly"))
    readBox(spark, path, m.xCol, m.yCol, x0, x1, y0, y1,
      m.xmin, m.xmax, m.ymin, m.ymax, m.bits, level, m.keyCol)
  }

  /** COARSE phase shared by the single- and multi-box reads: the union of
    * every box's covering Morton bands (re-merged across boxes), pushed
    * as one between-OR filter. Exact refinement is the caller's — the
    * spatial query path supplies its own transform-aware predicate
    * ([[graft.query.SpatialQuery.boundingBoxPointsMultiZ]]).
    */
  private[graft] def coarseBoxPrune(spark: SparkSession, path: String,
      boxes: Seq[(Double, Double, Double, Double)],
      xmin: Double, xmax: Double, ymin: Double, ymax: Double,
      bits: Int, level: Int, keyCol: String): DataFrame = {
    require(boxes.nonEmpty, "coarseBoxPrune: need at least one box")
    val bands = boxes.flatMap { case (x0, x1, y0, y1) =>
      zRangesForBox(
        quantizeScalar(x0, xmin, xmax, bits), quantizeScalar(x1, xmin, xmax, bits),
        quantizeScalar(y0, ymin, ymax, bits), quantizeScalar(y1, ymin, ymax, bits),
        bits, level)
    }.sortBy(_._1)
    val merged = bands.foldLeft(List.empty[(Long, Long)]) {
      case ((lo, hi) :: rest, (l, h)) if l <= hi + 1 => (lo, math.max(hi, h)) :: rest
      case (acc, b) => b :: acc
    }.reverse
    val prune = merged.map { case (lo, hi) => col(keyCol).between(lo, hi) }
      .reduce(_ || _)
    spark.read.parquet(path).filter(prune)
  }
}
