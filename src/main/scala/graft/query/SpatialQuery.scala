package graft.query

import graft.geom.{GPolygon, WKB}
import graft.geom.st._
import graft.model._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial queries — the reference's "WHERE clause"
  * (`_core/query/spatial_query.py`).
  *
  * Planning happens on the driver from manifest transforms alone (matrix
  * math over 3x3/4x4 arrays); the result is always a Catalyst `Column`
  * predicate so the data path stays declarative:
  *
  *  - identity / diagonal transform → raw range predicate on the coordinate
  *    columns → parquet min/max row-group pruning + pushdown for free
  *    (the reference's fast paths, spatial_query.py:324-326, 668-701);
  *  - general invertible affine → generated arithmetic predicate
  *    `m00*x + m01*y + t0 BETWEEN …` on the transformed coordinates
  *    (spatial_query.py:702-714);
  *  - shapes → coarse envelope-column range predicate (the distributed
  *    stand-in for the STRtree pre-filter, spatial_query.py:788) + exact
  *    WKB predicate.
  *
  * Box bounds are EXCLUSIVE on both sides for points (reference point mask
  * `(col > min) & (col < max)`, spatial_query.py:389-437) and inclusive for
  * raster pixel/tile coordinates (slice semantics, query/_utils.py:94-109).
  */
object SpatialQuery {

  /** Driver-side classification of a transform lowered onto `axes`. */
  sealed trait TransformCase
  case object IdentityCase extends TransformCase
  /** x_target = scale(i) * x_intrinsic + shift(i), axis-aligned. */
  final case class DiagonalCase(scale: Array[Double], shift: Array[Double]) extends TransformCase
  /** General invertible affine (row-major homogeneous matrix). */
  final case class AffineCase(matrix: Matrix) extends TransformCase

  def classify(t: Transform, axes: Seq[String]): TransformCase = {
    val m = t.toAffineMatrix(axes, axes)
    val n = axes.size
    var diagonal = true
    var identity = true
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        val v = m(i, j)
        if (i == j) {
          if (v != 1.0) identity = false
          if (v == 0.0) diagonal = false // singular on the diagonal
        } else if (v != 0.0) { diagonal = false; identity = false }
        j += 1
      }
      if (m(i, n) != 0.0) identity = false
      i += 1
    }
    if (identity) IdentityCase
    else if (diagonal) DiagonalCase(
      Array.tabulate(n)(i0 => m(i0, i0)), Array.tabulate(n)(i0 => m(i0, n)))
    else {
      // Cases 2-4 of the reference's rank analysis (non-invertible) raise;
      // Matrix.inverseMatrix throws on singularity the same way
      // (spatial_query.py:297-321).
      AffineCase(m)
    }
  }

  /** Bounding-box predicate for a points element: box given in `targetCs`,
    * data in intrinsic coordinates (spatial_query.py:618-743).
    */
  def boundingBoxPredicate(t: Transform, axes: Seq[String],
      mins: Seq[Double], maxs: Seq[Double]): Column = {
    require(axes.size == mins.size && axes.size == maxs.size)
    classify(t, axes) match {
      case IdentityCase =>
        axes.indices.map { i =>
          col(axes(i)) > mins(i) && col(axes(i)) < maxs(i)
        }.reduce(_ && _)
      case DiagonalCase(scale, shift) =>
        // Invert the interval per axis; negative scale swaps the bounds
        // (interval inversion, spatial_query.py:681-701).
        axes.indices.map { i =>
          val lo = (mins(i) - shift(i)) / scale(i)
          val hi = (maxs(i) - shift(i)) / scale(i)
          val (l, h) = if (lo <= hi) (lo, hi) else (hi, lo)
          col(axes(i)) > l && col(axes(i)) < h
        }.reduce(_ && _)
      case AffineCase(m) =>
        // Project intrinsic coords into target cs inside the predicate.
        val n = axes.size
        (0 until n).map { i =>
          val proj = axes.indices.map(j => lit(m(i, j)) * col(axes(j)))
            .reduce(_ + _) + lit(m(i, n))
          proj > mins(i) && proj < maxs(i)
        }.reduce(_ && _)
    }
  }

  /** Bounding-box query on points (element stays in intrinsic cs with its
    * original transforms, like the reference re-parse, spatial_query.py:719-743).
    */
  def boundingBoxPoints(df: DataFrame, t: Transform, axes: Seq[String],
      mins: Seq[Double], maxs: Seq[Double]): DataFrame =
    df.filter(boundingBoxPredicate(t, axes, mins, maxs))

  /** The query box expressed as a polygon in the element's intrinsic cs
    * (2D): inverse-transform the 4 corners (spatial_query.py:47-135).
    * Returns None if the inverse box is axis-aligned (identity/diagonal).
    */
  def intrinsicBoxPolygon(t: Transform, axes: Seq[String],
      mins: Seq[Double], maxs: Seq[Double]): Either[(Array[Double], Array[Double]), Array[Byte]] = {
    classify(t, axes) match {
      case IdentityCase => Left((mins.toArray, maxs.toArray))
      case DiagonalCase(scale, shift) =>
        val lo = new Array[Double](axes.size)
        val hi = new Array[Double](axes.size)
        var i = 0
        while (i < axes.size) {
          val a = (mins(i) - shift(i)) / scale(i)
          val b = (maxs(i) - shift(i)) / scale(i)
          lo(i) = math.min(a, b); hi(i) = math.max(a, b)
          i += 1
        }
        Left((lo, hi))
      case AffineCase(m) =>
        require(axes.size == 2, "rotated box polygon only supported in 2D")
        val inv = m.inverseMatrix
        def mapPt(x: Double, y: Double): (Double, Double) =
          (inv(0, 0) * x + inv(0, 1) * y + inv(0, 2),
           inv(1, 0) * x + inv(1, 1) * y + inv(1, 2))
        val corners = Seq(
          (mins(0), mins(1)), (maxs(0), mins(1)), (maxs(0), maxs(1)), (mins(0), maxs(1)))
          .map { case (x, y) => mapPt(x, y) }
        val ring = corners.flatMap { case (x, y) => Seq(x, y) }.toArray
        Right(WKB.write(GPolygon(Array(ring))))
    }
  }

  /** Bounding-box query on shapes: coarse envelope-column prefilter (scan-
    * prunable) then exact geometry test (spatial_query.py:746-800). `axes`
    * must be (x, y)-ordered for the envelope columns.
    */
  def boundingBoxShapes(df: DataFrame, t: Transform,
      mins: Seq[Double], maxs: Seq[Double]): DataFrame = {
    val axes = Seq("x", "y")
    intrinsicBoxPolygon(t, axes, mins, maxs) match {
      case Left((lo, hi)) =>
        val coarse = col("minx") <= hi(0) && col("maxx") >= lo(0) &&
          col("miny") <= hi(1) && col("maxy") >= lo(1)
        val exact = st_intersects_box(col("geometry"),
          lit(lo(0)), lit(lo(1)), lit(hi(0)), lit(hi(1)))
        df.filter(coarse && exact)
      case Right(boxWkb) =>
        val g = WKB.read(boxWkb).envelope
        val coarse = col("minx") <= g(2) && col("maxx") >= g(0) &&
          col("miny") <= g(3) && col("maxy") >= g(1)
        df.filter(coarse && st_intersects(col("geometry"), lit(boxWkb)))
    }
  }

  /** Bounding-box query on long-form labels (inclusive integer bounds —
    * raster slice semantics, query/_utils.py:94-109). Only identity/diagonal
    * transforms hit the fast path; general affine falls back to the
    * arithmetic predicate on pixel coordinates.
    */
  def boundingBoxLabels(df: DataFrame, t: Transform, dims: Seq[String],
      mins: Seq[Double], maxs: Seq[Double]): DataFrame = {
    classify(t, dims) match {
      case IdentityCase =>
        dims.indices.map { i =>
          col(dims(i)) >= math.floor(mins(i)) && col(dims(i)) <= math.ceil(maxs(i))
        }.reduce(_ && _) match { case p => df.filter(p) }
      case DiagonalCase(scale, shift) =>
        val preds = dims.indices.map { i =>
          val a = (mins(i) - shift(i)) / scale(i)
          val b = (maxs(i) - shift(i)) / scale(i)
          val (lo, hi) = if (a <= b) (a, b) else (b, a)
          col(dims(i)) >= math.floor(lo) && col(dims(i)) <= math.ceil(hi)
        }
        df.filter(preds.reduce(_ && _))
      case AffineCase(m) =>
        val n = dims.size
        val preds = (0 until n).map { i =>
          val proj = dims.indices.map(j => lit(m(i, j)) * col(dims(j)))
            .reduce(_ + _) + lit(m(i, n))
          proj >= mins(i) && proj <= maxs(i)
        }
        df.filter(preds.reduce(_ && _))
    }
  }

  /** Bounding-box query on tiled images: keep tiles whose pixel extent
    * overlaps the (intrinsic-cs) box, at EVERY pyramid level — a bbox crop
    * of a multiscale image returns a cropped pyramid, like the reference's
    * per-DataTree-scale slicing (spatial_query.py:537-615). A tile at
    * pyramid level `s` covers level-0 range `[tile*T*2^s, (tile*T + wh)*2^s)`
    * (the dyadic factor of `RasterOps.buildPyramid`/`selectPyramidLevel`),
    * so the box is compared against each level through its own scale
    * transform. Within-tile crop is the consumer's job
    * (RasterOps.cropTiles) — tile pruning is the scan-level win.
    */
  def boundingBoxImageTiles(df: DataFrame, t: Transform,
      mins: Seq[Double], maxs: Seq[Double], tileSize: Int = Models.ImageModel.TileSize): DataFrame = {
    val (lo, hi) = intrinsicBoxPolygon(t, Seq("x", "y"), mins, maxs) match {
      case Left(b) => b
      case Right(boxWkb) =>
        val e = WKB.read(boxWkb).envelope
        (Array(e(0), e(1)), Array(e(2), e(3)))
    }
    val f = pow(lit(2.0), col("scale").cast("double"))
    df.filter(
      (col("tile_x") * tileSize) * f <= hi(0) && (col("tile_x") * tileSize + col("w")) * f >= lo(0) &&
      (col("tile_y") * tileSize) * f <= hi(1) && (col("tile_y") * tileSize + col("h")) * f >= lo(1))
  }

  /** Polygon query on a tiled (multiscale) raster. The reference lowers a
    * polygon query on images/labels to the BOUNDING BOX of the polygon
    * (spatial_query.py:874-892), so the default here prunes tiles by the
    * polygon's envelope tested through each pyramid level's dyadic scale
    * transform — reference-identical semantics, every scale cropped, same
    * per-level algebra as [[boundingBoxImageTiles]]. `exact = true`
    * additionally tests each tile's level-0 rectangle against the polygon
    * itself (`st_intersects_box` kernel): a strictly tighter scan prune
    * that drops envelope-corner tiles the reference would keep — leave it
    * off when mirroring reference outputs.
    */
  def polygonQueryImageTiles(df: DataFrame, t: Transform, polyWkb: Array[Byte],
      tileSize: Int = Models.ImageModel.TileSize,
      exact: Boolean = false): DataFrame = {
    val intrinsicPoly = classify(t, Seq("x", "y")) match {
      case IdentityCase => polyWkb
      case DiagonalCase(scale, shift) =>
        graft.geom.GeomKernel.affine(polyWkb,
          1.0 / scale(0), 0.0, -shift(0) / scale(0),
          0.0, 1.0 / scale(1), -shift(1) / scale(1))
      case AffineCase(m) =>
        val inv = m.inverseMatrix
        graft.geom.GeomKernel.affine(polyWkb,
          inv(0, 0), inv(0, 1), inv(0, 2), inv(1, 0), inv(1, 1), inv(1, 2))
    }
    val env = WKB.read(intrinsicPoly).envelope
    val f = pow(lit(2.0), col("scale").cast("double"))
    val x0 = (col("tile_x") * tileSize) * f
    val x1 = (col("tile_x") * tileSize + col("w")) * f
    val y0 = (col("tile_y") * tileSize) * f
    val y1 = (col("tile_y") * tileSize + col("h")) * f
    val coarse = x0 <= env(2) && x1 >= env(0) && y0 <= env(3) && y1 >= env(1)
    df.filter(
      if (exact) coarse && st_intersects_box(lit(intrinsicPoly), x0, y0, x1, y1)
      else coarse)
  }

  // ---- polygon query (spatial_query.py:803-975) ----

  /** Points in polygon: coarse bbox range (pushdown) + exact ray-cast
    * (spatial_query.py:895-923). `polyWkb` given in target cs; points are
    * projected through `t` inside the predicate when not identity.
    */
  def polygonQueryPoints(df: DataFrame, t: Transform, polyWkb: Array[Byte]): DataFrame = {
    val env = WKB.read(polyWkb).envelope
    classify(t, Seq("x", "y")) match {
      case IdentityCase =>
        df.filter(
          col("x") >= env(0) && col("x") <= env(2) &&
          col("y") >= env(1) && col("y") <= env(3) &&
          st_contains_point(lit(polyWkb), col("x"), col("y")))
      case DiagonalCase(scale, shift) =>
        val loX = math.min((env(0) - shift(0)) / scale(0), (env(2) - shift(0)) / scale(0))
        val hiX = math.max((env(0) - shift(0)) / scale(0), (env(2) - shift(0)) / scale(0))
        val loY = math.min((env(1) - shift(1)) / scale(1), (env(3) - shift(1)) / scale(1))
        val hiY = math.max((env(1) - shift(1)) / scale(1), (env(3) - shift(1)) / scale(1))
        df.filter(
          col("x") >= loX && col("x") <= hiX && col("y") >= loY && col("y") <= hiY &&
          st_contains_point(lit(polyWkb),
            lit(scale(0)) * col("x") + lit(shift(0)),
            lit(scale(1)) * col("y") + lit(shift(1))))
      case AffineCase(m) =>
        val px = lit(m(0, 0)) * col("x") + lit(m(0, 1)) * col("y") + lit(m(0, 2))
        val py = lit(m(1, 0)) * col("x") + lit(m(1, 1)) * col("y") + lit(m(1, 2))
        df.filter(px >= env(0) && px <= env(2) && py >= env(1) && py <= env(3) &&
          st_contains_point(lit(polyWkb), px, py))
    }
  }

  /** Shapes intersecting polygon: coarse envelope overlap + exact WKB
    * intersects; optional clip to the polygon (spatial_query.py:926-975).
    */
  def polygonQueryShapes(df: DataFrame, t: Transform, polyWkb: Array[Byte],
      clip: Boolean = false): DataFrame = {
    // Bring the polygon into intrinsic coordinates (shapes transform rarely
    // differs from identity; general case inverse-maps the polygon).
    val intrinsicPoly = classify(t, Seq("x", "y")) match {
      case IdentityCase => polyWkb
      case DiagonalCase(scale, shift) =>
        graft.geom.GeomKernel.affine(polyWkb,
          1.0 / scale(0), 0.0, -shift(0) / scale(0),
          0.0, 1.0 / scale(1), -shift(1) / scale(1))
      case AffineCase(m) =>
        val inv = m.inverseMatrix
        graft.geom.GeomKernel.affine(polyWkb,
          inv(0, 0), inv(0, 1), inv(0, 2), inv(1, 0), inv(1, 1), inv(1, 2))
    }
    val env = WKB.read(intrinsicPoly).envelope
    val coarse = col("minx") <= env(2) && col("maxx") >= env(0) &&
      col("miny") <= env(3) && col("maxy") >= env(1)
    val filtered = df.filter(coarse && st_intersects(col("geometry"), lit(intrinsicPoly)))
    if (!clip) filtered
    else {
      // Clip kind decided ONCE on the driver: convex hole-free rings take
      // the single-pass Sutherland-Hodgman path; reflex and HOLED clip
      // polygons the convex-decomposition path (st_clip — ear triangles /
      // trapezoid bands, partition-of-intersection output, exact
      // area/containment, matching the reference's arbitrary-geometry
      // shapely clip, spatial_query.py:958-963). No silent unclipped
      // fallback: a null clip result means a zero-area (boundary-touching)
      // intersection and the row is dropped, never returned unclipped.
      val clipGeom = WKB.read(intrinsicPoly) match {
        case p: graft.geom.GPolygon => p
        case _ => sys.error("polygon_query(clip=True) requires a polygon clip geometry")
      }
      val clipExpr =
        if (clipGeom.rings.length == 1 &&
          graft.geom.GeomKernel.isConvexRing(clipGeom.rings(0)))
          st_clip_convex(col("geometry"), lit(intrinsicPoly))
        else st_clip(col("geometry"), lit(intrinsicPoly))
      val clipped = filtered
        .withColumn("geometry", clipExpr)
        .filter(col("geometry").isNotNull)
      // geometry changed -> recompute the coarse-index envelope columns
      Models.ShapesModel.parse(clipped)
    }
  }

  /** Corners of a bounding box in the reference's vertex order
    * (`get_bounding_box_corners`, query/_utils.py:18-82): 4 corners for 2D,
    * 8 for 3D, each a coordinate Seq aligned with `axes`.
    */
  def boundingBoxCorners(axes: Seq[String], mins: Seq[Double],
      maxs: Seq[Double]): Seq[Seq[Double]] = {
    require(axes.length == mins.length && axes.length == maxs.length,
      "axes/min/max lengths must match")
    require(axes.length == 2 || axes.length == 3, "bounding box must be 2D or 3D")
    if (axes.length == 2)
      Seq(
        Seq(mins(0), mins(1)), Seq(mins(0), maxs(1)),
        Seq(maxs(0), maxs(1)), Seq(maxs(0), mins(1)))
    else
      Seq(
        Seq(mins(0), mins(1), mins(2)), Seq(mins(0), mins(1), maxs(2)),
        Seq(mins(0), maxs(1), maxs(2)), Seq(mins(0), maxs(1), mins(2)),
        Seq(maxs(0), mins(1), mins(2)), Seq(maxs(0), mins(1), maxs(2)),
        Seq(maxs(0), maxs(1), maxs(2)), Seq(maxs(0), maxs(1), mins(2)))
  }

  /** Multi-box batch query (the reference's vectorized bounding_box_query,
    * spatial_query.py:458-505 with batched boxes): OR of per-box predicates
    * — one scan, all boxes (parquet pruning still applies to the OR of
    * ranges).
    */
  def boundingBoxPointsMulti(df: DataFrame, t: Transform, axes: Seq[String],
      boxes: Seq[(Seq[Double], Seq[Double])]): DataFrame = {
    require(boxes.nonEmpty, "need at least one box")
    df.filter(boxes.map { case (mins, maxs) =>
      boundingBoxPredicate(t, axes, mins, maxs)
    }.reduce(_ || _))
  }

  /** [[boundingBoxPointsMulti]] over a Z-ORDERED at-rest points layout
    * ([[graft.ops.ZOrder.writeZOrdered]]): each target-cs box is lowered
    * to its intrinsic-cs envelope (inverse corner transform — rotated
    * boxes take the envelope of the back-mapped polygon), the envelopes'
    * covering Morton bands prune the parquet scan (row-group min/max on
    * the key column), and the SAME exact transform-aware predicate as the
    * plain path refines — so the result is row-identical to
    * [[boundingBoxPointsMulti]] on the raw table, but the scan reads only
    * the curve segments the boxes touch. This is the 100 TB form of
    * SURVEY §2.3's query family: layout-pruned at rest, exact on read.
    */
  def boundingBoxPointsMultiZ(spark: org.apache.spark.sql.SparkSession,
      path: String, t: Transform, axes: Seq[String],
      boxes: Seq[(Seq[Double], Seq[Double])], level: Int = 8): DataFrame = {
    require(boxes.nonEmpty, "need at least one box")
    require(axes.toSet == Set("x", "y"),
      s"boundingBoxPointsMultiZ: 2D x/y layouts only, got $axes")
    val m = graft.ops.ZOrder.readMeta(spark, path)
      .getOrElse(throw new IllegalArgumentException(
        s"boundingBoxPointsMultiZ: no _zorder_meta under $path"))
    require(m.xCol == "x" && m.yCol == "y",
      s"boundingBoxPointsMultiZ: layout clusters (${m.xCol}, ${m.yCol}), expected (x, y)")
    val xi = axes.indexOf("x"); val yi = axes.indexOf("y")
    val envs = boxes.map { case (mins, maxs) =>
      intrinsicBoxPolygon(t, axes, mins, maxs) match {
        case Left((lo, hi)) => (lo(xi), hi(xi), lo(yi), hi(yi))
        case Right(wkb) =>
          val e = WKB.read(wkb).envelope
          (e(0), e(2), e(1), e(3))
      }
    }
    graft.ops.ZOrder.coarseBoxPrune(spark, path, envs,
        m.xmin, m.xmax, m.ymin, m.ymax, m.bits, level, m.keyCol)
      .filter(boxes.map { case (mins, maxs) =>
        boundingBoxPredicate(t, axes, mins, maxs)
      }.reduce(_ || _))
  }

  /** [[polygonQueryPoints]] over a Z-ORDERED at-rest points layout: the
    * polygon is inverse-mapped into the layout's intrinsic cs, its
    * envelope's covering Morton bands prune the scan, and the plain
    * path's exact predicate (coarse bbox + ray-cast through the
    * transform) refines — row-identical to [[polygonQueryPoints]] on the
    * raw table.
    */
  def polygonQueryPointsZ(spark: org.apache.spark.sql.SparkSession,
      path: String, t: Transform, polyWkb: Array[Byte],
      level: Int = 8): DataFrame = {
    val m = graft.ops.ZOrder.readMeta(spark, path)
      .getOrElse(throw new IllegalArgumentException(
        s"polygonQueryPointsZ: no _zorder_meta under $path"))
    require(m.xCol == "x" && m.yCol == "y",
      s"polygonQueryPointsZ: layout clusters (${m.xCol}, ${m.yCol}), expected (x, y)")
    val intrinsicPoly = classify(t, Seq("x", "y")) match {
      case IdentityCase => polyWkb
      case DiagonalCase(scale, shift) =>
        graft.geom.GeomKernel.affine(polyWkb,
          1.0 / scale(0), 0.0, -shift(0) / scale(0),
          0.0, 1.0 / scale(1), -shift(1) / scale(1))
      case AffineCase(mm) =>
        val inv = mm.inverseMatrix
        graft.geom.GeomKernel.affine(polyWkb,
          inv(0, 0), inv(0, 1), inv(0, 2), inv(1, 0), inv(1, 1), inv(1, 2))
    }
    val env = WKB.read(intrinsicPoly).envelope
    val pruned = graft.ops.ZOrder.coarseBoxPrune(spark, path,
      Seq((env(0), env(2), env(1), env(3))),
      m.xmin, m.xmax, m.ymin, m.ymax, m.bits, level, m.keyCol)
    polygonQueryPoints(pruned, t, polyWkb)
  }

  /** Polygon query on rasters = bounding-box query on the polygon envelope
    * (reference spatial_query.py:874-892).
    */
  def polygonQueryLabels(df: DataFrame, t: Transform, dims: Seq[String],
      polyWkb: Array[Byte]): DataFrame = {
    val env = WKB.read(polyWkb).envelope
    // envelope is (minx, miny, maxx, maxy); map onto dims order (y,x)/(x,y)
    val byAxis = Map("x" -> (env(0), env(2)), "y" -> (env(1), env(3)))
    val mins = dims.map(d => byAxis(d)._1)
    val maxs = dims.map(d => byAxis(d)._2)
    boundingBoxLabels(df, t, dims, mins, maxs)
  }

  // ---- container-level query (spatialdata.py:2466-2528 QueryManager) ----

  /** Bounding-box query over a whole container: every spatial element is
    * filtered in its own intrinsic cs; annotating tables cascade via
    * left-semi joins (query/_utils.py:199-231).
    */
  def boundingBox(sd: SpatialDataset, axes: Seq[String], mins: Seq[Double],
      maxs: Seq[Double], targetCs: String, filterTable: Boolean = true): SpatialDataset = {
    val filtered = sd.manifest.elements.flatMap { meta =>
      val el = sd.element(meta.name)
      meta.kind match {
        case ElementKind.Points =>
          val t = sd.transformTo(meta.name, targetCs)
          Some(el.copy(data = boundingBoxPoints(el.data, t, axes, mins, maxs)))
        case ElementKind.Shapes =>
          val t = sd.transformTo(meta.name, targetCs)
          Some(el.copy(data = boundingBoxShapes(el.data, t, mins, maxs)))
        case ElementKind.Labels =>
          val t = sd.transformTo(meta.name, targetCs)
          // labels dims are (y,x)/(z,y,x); query axes arrive (x,y[,z])-ordered
          val dimOrder = meta.dims
          val idx = dimOrder.map(axes.indexOf)
          require(idx.forall(_ >= 0), s"axes $axes do not cover label dims $dimOrder")
          Some(el.copy(data = boundingBoxLabels(el.data, t, dimOrder,
            idx.map(mins), idx.map(maxs))))
        case ElementKind.Images =>
          val t = sd.transformTo(meta.name, targetCs)
          Some(el.copy(data = boundingBoxImageTiles(el.data, t, mins, maxs)))
        case ElementKind.Tables => Some(el)
      }
    }
    val out = new SpatialDataset(sd.spark, sd.manifest,
      filtered.map(e => e.meta.name -> e).toMap)
    if (filterTable) RelationalQuery.filterTablesByElements(out) else out
  }
}
