package graft.ops

import graft.geom.st._
import graft.model._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's central analytics operator family
  * (`_core/operations/aggregate.py`): aggregate points/shapes values by
  * shapes regions, or image channels by labels (zonal statistics), plus
  * centroids and extents.
  *
  * Every path is spatial-join + `groupBy().agg()` — Catalyst plans partial
  * (map-side) + final aggregation automatically, which is exactly the
  * tree-reduce the reference hand-builds through dask
  * (aggregate.py:292, SURVEY.md §4).
  */
object Aggregate {

  /** Whitelisted reductions (aggregate.py:73-76 + datashader set,
    * rasterize.py:694).
    */
  def reduction(aggFunc: String, c: Column): Column = aggFunc match {
    case "sum" => sum(c)
    case "mean" | "avg" => avg(c)
    case "count" => count(c)
    case "min" => min(c)
    case "max" => max(c)
    case "first" => first(c)
    case "std" => stddev_samp(c)
    case "var" => var_samp(c)
    case other => sys.error(s"unsupported agg_func '$other'")
  }

  /** Points aggregated by shapes regions (`_aggregate_shapes`,
    * aggregate.py:312-493). `valueKey=None` counts. Output: long-form
    * (region_id, value) — one row per region, the X matrix column.
    */
  def pointsByShapes(points: DataFrame, shapes: DataFrame,
      valueKey: Option[String], aggFunc: String = "sum",
      grid: Option[Double] = None): DataFrame = {
    val joined = grid match {
      case Some(cell) => SpatialJoin.pointsInShapesGrid(points, shapes, cell)
      case None => SpatialJoin.pointsInShapesBroadcast(points, shapes)
    }
    val valueCol = valueKey.map(col).getOrElse(lit(1L))
    joined.groupBy(col("region_id"))
      .agg(reduction(if (valueKey.isEmpty) "count" else aggFunc, valueCol).as("value"))
  }

  /** Categorical aggregation: count/sum per (region, category) — this IS the
    * long-form sparse X output directly (COO build, aggregate.py:454-488).
    */
  def pointsByShapesCategorical(points: DataFrame, shapes: DataFrame,
      categoryKey: String, valueKey: Option[String] = None,
      aggFunc: String = "count", grid: Option[Double] = None): DataFrame = {
    val joined = grid match {
      case Some(cell) => SpatialJoin.pointsInShapesGrid(points, shapes, cell)
      case None => SpatialJoin.pointsInShapesBroadcast(points, shapes)
    }
    val valueCol = valueKey.map(col).getOrElse(lit(1L))
    joined.groupBy(col("region_id"), col(categoryKey).as("var_name"))
      .agg(reduction(aggFunc, valueCol).as("value"))
  }

  /** Shapes-by-shapes with optional `fractions=True` weighting: value *
    * intersection_area / value_area (aggregate.py:435-450). `gridCell`
    * selects the grid-bucketed join (big-by-big; cell ~ median envelope
    * edge) instead of broadcasting the `by` side.
    */
  def shapesByShapes(by: DataFrame, values: DataFrame, valueKey: String,
      aggFunc: String = "sum", fractions: Boolean = false,
      gridCell: Option[Double] = None,
      assumeConvexBy: Boolean = true): DataFrame = {
    val joined = gridCell match {
      case Some(cell) => SpatialJoin.shapesIntersectShapesGrid(by, values, cell,
        withIntersectionArea = fractions, assumeConvexBy = assumeConvexBy)
      case None => SpatialJoin.shapesIntersectShapes(by, values,
        withIntersectionArea = fractions, assumeConvexBy = assumeConvexBy)
    }
    val v =
      if (fractions) col(valueKey) * col("intersection_area") / col("value_area")
      else col(valueKey)
    joined.groupBy(col("region_id")).agg(reduction(aggFunc, v).as("value"))
  }

  /** Zonal statistics: image channels aggregated per label
    * (`_aggregate_image_by_labels` via xrspatial.zonal_stats,
    * aggregate.py:248-309). Both sides long-form pixels; zone 0 dropped.
    * One hash aggregate — partial+final for free.
    */
  def imageByLabels(pixels: DataFrame, labels: DataFrame,
      aggFunc: String = "mean", dims: Seq[String] = Seq("y", "x")): DataFrame = {
    val joined = pixels.join(labels.filter(col("label") =!= 0), dims)
    joined.groupBy(col("label"), col("c"))
      .agg(reduction(aggFunc, col("value")).as("value"))
  }

  /** Tiled-image zonal stats: explode tiles to pixels first (the tile is the
    * reference's dask block; posexplode keeps it one codegen stage).
    */
  def tilesByLabels(tiles: DataFrame, labels: DataFrame,
      aggFunc: String = "mean", tileSize: Int = Models.ImageModel.TileSize): DataFrame = {
    val pixels = tiles
      .select(col("c"), col("tile_y"), col("tile_x"), col("h"), col("w"),
        posexplode(col("px")).as(Seq("pos", "value")))
      .select(col("c"),
        (col("tile_y") * tileSize + (col("pos") / col("w")).cast("int")).as("y"),
        (col("tile_x") * tileSize + col("pos") % col("w")).cast("int").as("x"),
        col("value"))
    imageByLabels(pixels, labels, aggFunc)
  }

  // ---- centroids (`_core/centroids.py`) ----

  /** Labels centroids: mean pixel coordinate per label, background dropped
    * (single-pass bincount in the reference, centroids.py:58-102 — here one
    * hash aggregate).
    */
  def labelCentroids(labels: DataFrame, dims: Seq[String] = Seq("y", "x")): DataFrame = {
    val aggs = dims.map(d => avg(col(d)).as(d))
    labels.filter(col("label") =!= 0)
      .groupBy(col("label"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Shapes centroids: circles = center, polygons = area centroid
    * (centroids.py:108-126).
    */
  def shapeCentroids(shapes: DataFrame): DataFrame =
    shapes.select(col("index"),
      st_centroid_x(col("geometry")).as("x"),
      st_centroid_y(col("geometry")).as("y"))

  // ---- extent (`_core/data_extent.py`) ----

  /** Extent of a points element (data_extent.py:78-82). */
  def pointsExtent(points: DataFrame, px: String = "x", py: String = "y"): DataFrame =
    points.agg(min(col(px)).as("xmin"), min(col(py)).as("ymin"),
      max(col(px)).as("xmax"), max(col(py)).as("ymax"))

  /** Extent of shapes: envelope columns already carry circle radius padding
    * (data_extent.py:24-75).
    */
  def shapesExtent(shapes: DataFrame): DataFrame =
    shapes.agg(min(col("minx")).as("xmin"), min(col("miny")).as("ymin"),
      max(col("maxx")).as("xmax"), max(col("maxy")).as("ymax"))

  /** Extents equal within `atol` (reference `are_extents_equal`,
    * data_extent.py:362-385): both single-row extent frames must cover the
    * same axes and agree per bound. The high default tolerance mirrors the
    * reference's (its rasterize extent bug, scverse/spatialdata#165).
    */
  def areExtentsEqual(e0: DataFrame, e1: DataFrame, atol: Double = 0.1): Boolean = {
    if (e0.columns.sorted.toSeq != e1.columns.sorted.toSeq) return false
    val cols = e0.columns.toSeq
    val r0 = e0.collect()(0)
    val r1 = e1.select(cols.map(col): _*).collect()(0)
    cols.indices.forall { i =>
      math.abs(r0.getAs[Number](i).doubleValue() -
        r1.getAs[Number](i).doubleValue()) <= atol
    }
  }

  /** Container extent in a target cs: per-element extents transformed by the
    * 4 bbox corners (approx path, data_extent.py:153-164) and unioned on the
    * driver (tiny).
    */
  def containerExtent(sd: SpatialDataset, cs: String): (Double, Double, Double, Double) = {
    val exts = sd.manifest.elements.flatMap { meta =>
      val el = sd.element(meta.name)
      val extDf = meta.kind match {
        case ElementKind.Points => Some(pointsExtent(el.data))
        case ElementKind.Shapes => Some(shapesExtent(el.data))
        case ElementKind.Labels =>
          Some(el.data.agg(min(col("x")).cast("double").as("xmin"),
            min(col("y")).cast("double").as("ymin"),
            max(col("x")).cast("double").as("xmax"),
            max(col("y")).cast("double").as("ymax")))
        case _ => None
      }
      extDf.map { df =>
        val r = df.collect()(0)
        val m = CsGraph.elementToCs(sd.manifest, meta.name, cs)
          .toAffineMatrix(Seq("x", "y"), Seq("x", "y"))
        // transform the 4 corners, take the envelope
        val corners = Seq(
          (r.getDouble(0), r.getDouble(1)), (r.getDouble(2), r.getDouble(1)),
          (r.getDouble(2), r.getDouble(3)), (r.getDouble(0), r.getDouble(3)))
          .map { case (x, y) =>
            (m(0, 0) * x + m(0, 1) * y + m(0, 2), m(1, 0) * x + m(1, 1) * y + m(1, 2)) }
        (corners.map(_._1).min, corners.map(_._2).min,
          corners.map(_._1).max, corners.map(_._2).max)
      }
    }
    require(exts.nonEmpty, "container has no spatial elements")
    (exts.map(_._1).min, exts.map(_._2).min, exts.map(_._3).max, exts.map(_._4).max)
  }

  // ---- concatenate (`_core/concatenate.py`) ----

  /** Table concat: obs/X unioned by name with missing columns null-filled
    * (anndata.concat, concatenate.py:28-78).
    */
  def concatTables(tables: Seq[SpatialElement], name: String): SpatialElement = {
    require(tables.nonEmpty)
    val obs = tables.map(_.data).reduce(_.unionByName(_, allowMissingColumns = true))
    val xs = tables.flatMap(_.aux.get("X"))
    val aux = if (xs.isEmpty) Map.empty[String, DataFrame]
      else Map("X" -> xs.reduce(_.unionByName(_, allowMissingColumns = true)))
    val anns = tables.flatMap(_.meta.table)
    val mergedAnn = anns.headOption.map(a =>
      a.copy(region = anns.flatMap(_.region).distinct))
    SpatialElement(Models.TableModel.meta(name, mergedAnn), obs, aux)
  }

  /** Container union (reference concatenate.py:81-275). With `suffixes`
    * (the dict form), every element renames to `name-{suffix}` and the
    * WHOLE linkage renames with it, like `_fix_ensure_unique_element_names`
    * (concatenate.py:225-276): coordinate systems gain the suffix (unless
    * `mergeCoordinateSystemsOnName`), table annotation regions rename, and
    * the obs region-key column VALUES — plus the long-form X/layer region
    * columns — are rewritten so rows still resolve to their element.
    * `concatenateTables=false` keeps same-named tables apart with `_N`
    * integer suffixes (the reference warns + renames); `true` merges them
    * through [[concatTables]].
    */
  def concatenate(sds: Seq[SpatialDataset],
      suffixes: Option[Seq[String]] = None,
      concatenateTables: Boolean = false,
      mergeCoordinateSystemsOnName: Boolean = false): SpatialDataset = {
    require(sds.nonEmpty)
    require(suffixes.isDefined || !mergeCoordinateSystemsOnName,
      "mergeCoordinateSystemsOnName needs the suffix form (reference ValueError)")
    val spark = sds.head.spark
    val fixed: Seq[Seq[SpatialElement]] = suffixes match {
      case Some(sfx) =>
        require(sfx.size == sds.size, "one suffix per dataset")
        sds.zip(sfx).map { case (sd, s) =>
          sd.elementData.values.toSeq.map { el =>
            val newTransforms =
              if (mergeCoordinateSystemsOnName) el.meta.transforms
              else el.meta.transforms.map { case (cs, t) => s"$cs-$s" -> t }
            val newTable = el.meta.table.map(t =>
              t.copy(region = t.region.map(r => s"$r-$s")))
            val suffixRegion = (df: DataFrame, c: String) =>
              df.withColumn(c, concat(col(c).cast("string"), lit(s"-$s")))
            val newData = (el.meta.kind, el.meta.table) match {
              case (ElementKind.Tables, Some(ann)) => suffixRegion(el.data, ann.regionKey)
              case _ => el.data
            }
            // aux X/layer frames use the engine's FIXED long-form schema
            // (instance_id, region, var_name, value) — the literal "region"
            // here is that layout contract, unlike obs whose region column
            // is named by the annotation's regionKey
            val newAux =
              if (el.meta.table.isEmpty) el.aux
              else el.aux.map { case (k, df) =>
                if ((k == "X" || k.startsWith("layer:")) && df.columns.contains("region"))
                  k -> suffixRegion(df, "region")
                else k -> df
              }
            el.copy(meta = el.meta.copy(name = s"${el.meta.name}-$s",
              transforms = newTransforms, table = newTable),
              data = newData, aux = newAux)
          }
        }
      case None => sds.map(_.elementData.values.toSeq)
    }
    val all = fixed.flatten
    val (tables, others) = all.partition(_.meta.kind == ElementKind.Tables)
    val finalTables =
      if (concatenateTables)
        tables.groupBy(_.meta.name).toSeq.sortBy(_._1).map { case (n, ts) =>
          if (ts.size == 1) ts.head else concatTables(ts, n)
        }
      else {
        val dup = tables.groupBy(_.meta.name).view.mapValues(_.size).toMap
        val counters = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
        tables.map { el =>
          if (dup(el.meta.name) > 1) {
            val c = counters(el.meta.name); counters(el.meta.name) = c + 1
            el.copy(meta = el.meta.copy(name = s"${el.meta.name}_$c"))
          } else el
        }
      }
    SpatialDataset(spark, others ++ finalTables)
  }
}
