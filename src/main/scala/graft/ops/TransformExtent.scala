package graft.ops

import graft.model._
import org.apache.spark.sql.functions._

/** `transform_to_data_extent`
  * (`reference/src/spatialdata/_core/operations/_utils.py:13-139`):
  * normalize a container so that pixels and vector units coincide — vector
  * elements are transformed into the target cs then shifted/scaled onto a
  * `[0, W) x [0, H)` pixel frame; raster elements are resampled onto that
  * frame through `rasterize` (here [[RasterOps.rasterizeRaster]], which
  * also applies the pyramid-level heuristic); every element's transform
  * becomes Identity (or the positioning-preserving inverse when
  * `maintainPositioning`).
  */
object TransformExtent {

  /** Target height from width via the extent aspect ratio
    * (`_compute_target_dimensions`, rasterize.py:49-151; round half-up).
    */
  def targetHeightFor(targetWidth: Int, wBb: Double, hBb: Double): Int =
    math.floor(targetWidth / (wBb / hBb) + 0.5).toInt

  def transformToDataExtent(sd: SpatialDataset, cs: String, targetWidth: Int,
      maintainPositioning: Boolean = false): SpatialDataset = {
    val filtered = sd.filterByCoordinateSystem(cs)
    val (xmin, ymin, xmax, ymax) = Aggregate.containerExtent(filtered, cs)
    val (wBb, hBb) = (xmax - xmin, ymax - ymin)
    val targetHeight = targetHeightFor(targetWidth, wBb, hBb)
    val sx = targetWidth / wBb
    val sy = targetHeight / hBb
    val toFrame = Transform.sequence(
      TranslationT(Seq(-xmin, -ymin), Seq("x", "y")),
      ScaleT(Seq(sx, sy), Seq("x", "y")))
    val newCsT: Transform =
      if (maintainPositioning) toFrame.inverse else IdentityT

    val newEls = filtered.manifest.elements.map { meta =>
      val el = filtered.element(meta.name)
      val t = if (meta.kind == ElementKind.Tables) IdentityT
        else filtered.transformTo(meta.name, cs)
      val full = Transform.sequence(t, toFrame)
      val data = meta.kind match {
        case ElementKind.Points =>
          TransformOps.transformPoints(el.data,  full,
            if (meta.dims.nonEmpty) meta.dims else Seq("x", "y"))
        case ElementKind.Shapes =>
          TransformOps.transformShapes(el.data, full)
        case ElementKind.Labels =>
          RasterOps.rasterizeRaster(el.data, "label", t,
            Seq(xmin, ymin), Seq(xmax, ymax), targetWidth, targetHeight)._1
        case ElementKind.Images =>
          val numLevels = 1 + el.data.agg(max(col("scale"))).collect()(0).getInt(0)
          val px = RasterOps.tilesToPixels(el.data, meta.tileSize)
          val (res, _) = RasterOps.rasterizeRaster(px, "value", t,
            Seq(xmin, ymin), Seq(xmax, ymax), targetWidth, targetHeight,
            numLevels = numLevels, keepCols = Seq("c"))
          RasterOps.pixelsToTiles(res)
        case ElementKind.Tables => el.data
      }
      val newMeta0 =
        if (meta.kind == ElementKind.Tables) meta
        else meta.copy(transforms = Map(cs -> newCsT))
      // images are re-tiled onto the default tile size above — a stale
      // store tile_size attr would corrupt later tile->pixel decodes
      val newMeta =
        if (meta.kind == ElementKind.Images) newMeta0.copy(attrs = newMeta0.attrs - "tile_size")
        else newMeta0
      SpatialElement(newMeta, data, el.aux)
    }
    SpatialDataset(filtered.spark, newEls, filtered.manifest.attrs)
  }
}
