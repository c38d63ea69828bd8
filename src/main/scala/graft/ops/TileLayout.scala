package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.ZoneMapIndex

/** At-rest TILED-RASTER layout with a zone-map prune path — the raster
  * twin of [[ZOrder]]'s point layout, closing the one at-rest family that
  * had no sidecar prune: a 100 TB image store laid out this way answers a
  * bbox crop by reading O(blocks touched) partition directories, never
  * listing the rest.
  *
  * Layout: the canonical tile table (`scale, c, tile_y, tile_x, h, w, px`
  * — [[graft.ops.RasterOps.pixelsToTiles]]) partitioned by a coarse
  * `blk = "scale_⌊tile_y/B⌋_⌊tile_x/B⌋"` directory key (B = `blockTiles`,
  * default 8 → 128×128 px dirs at tile size 16 — directories stay
  * O(thousands) even for gigapixel planes, far from the small-file
  * regime), with a [[graft.pipeline.ZoneMapIndex]] sidecar over
  * (scale, tile_y, tile_x). A crop intersects all three ranges in the
  * sidecar (O(partitions) planning rows), then scans with the partition
  * list in `PartitionFilters` and the exact tile ranges pushed to row
  * groups — RasterZoneSpec pins the pruned-scan shape.
  *
  * Appends (a new scale level, a new acquisition region) merge the
  * sidecar arithmetically ([[ZoneMapIndex.appendZoneMapped]]).
  */
object TileLayout {

  private def blkCol(blockTiles: Int) = concat_ws("_",
    col("scale").cast("string"),
    (col("tile_y") / blockTiles).cast("int").cast("string"),
    (col("tile_x") / blockTiles).cast("int").cast("string"))

  /** Write the tile table as a zone-mapped block layout. */
  def write(tiles: DataFrame, path: String, blockTiles: Int = 8): Unit = {
    require(blockTiles >= 1, s"TileLayout.write: blockTiles >= 1, got $blockTiles")
    ZoneMapIndex.writeZoneMapped(
      tiles.withColumn("__blk", blkCol(blockTiles)),
      path, "__blk", Seq("scale", "tile_y", "tile_x"))
    tiles.sparkSession.createDataFrame(Seq(Tuple1(blockTiles)))
      .toDF("blockTiles")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_tile_meta")
  }

  /** Append new tiles (a new scale level / region): same block key
    * derivation (B from the layout's meta), arithmetic sidecar merge.
    */
  def append(tiles: DataFrame, path: String): Unit = {
    val spark = tiles.sparkSession
    val b = spark.read.parquet(s"$path/_tile_meta")
      .collect().head.getAs[Int]("blockTiles")
    ZoneMapIndex.appendZoneMapped(
      tiles.withColumn("__blk", blkCol(b)), path)
  }

  /** Crop one scale level to an inclusive TILE-coordinate box through the
    * sidecar: only partitions whose (scale, tile_y, tile_x) zone ranges
    * intersect are scanned. Pixel-precise crops compose on the result
    * ([[RasterOps.tilesToPixels]] + a y/x filter).
    */
  def crop(spark: SparkSession, path: String, scale: Int,
      tileY0: Int, tileY1: Int, tileX0: Int, tileX1: Int): DataFrame = {
    require(tileY0 <= tileY1 && tileX0 <= tileX1,
      s"TileLayout.crop: empty box ($tileY0..$tileY1, $tileX0..$tileX1)")
    ZoneMapIndex.readRanges(spark, path, Seq(
        ("scale", scale, scale),
        ("tile_y", tileY0, tileY1),
        ("tile_x", tileX0, tileX1)))
      .drop("__blk")
  }
}
