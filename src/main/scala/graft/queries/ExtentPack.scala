package graft.queries

import graft.{QueryPack, Tables}
import graft.model._
import graft.ops.{RasterOps, TransformExtent}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gates for rasterize-of-rasters with the pyramid-level heuristic
  * (rasterize.py:406-451) and transform_to_data_extent
  * (_core/operations/_utils.py:13-139).
  *
  * IEEE discipline: every driver-side constant that reaches the plan
  * (inverse-affine coefficients, extent-derived scales) is mirrored in the
  * oracle by the SAME chain of double operations — the matrix algebra here
  * reduces to exact products/sums for the diagonal transforms used, so the
  * gather coordinates are bit-identical across engines.
  */
object ExtentPack extends QueryPack {

  // single-channel 64x64 count raster from events
  private def pixels(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      lit(0).as("c"),
      (col("event_id") % 64).cast("int").as("y"),
      (col("user_id") % 64).cast("int").as("x"))
      .groupBy("c", "y", "x").agg(count(lit(1)).cast("double").as("value"))

  private val pixelsSql =
    """SELECT 0 AS c, CAST(event_id % 64 AS INT) AS y, CAST(user_id % 64 AS INT) AS x,
      |       CAST(COUNT(*) AS DOUBLE) AS value
      |FROM events GROUP BY 2, 3""".stripMargin

  // points element for the data-extent gates
  private def tdePoints(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") / 1000.0).as("x"),
      col("l_quantity").as("y"))

  private val tdePointsSql =
    "SELECT l_orderkey, l_linenumber, l_extendedprice / 1000.0 AS x, l_quantity AS y FROM lineitem"

  // labels element: 48x48 grid
  private def tdeLabels(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      (col("event_id") % 48).cast("int").as("y"),
      (col("user_id") % 48).cast("int").as("x"))
      .groupBy("y", "x").agg((min(col("y")) % 7 + 1).cast("long").as("label"))

  private val tdeLabelsSql =
    """SELECT CAST(event_id % 48 AS INT) AS y, CAST(user_id % 48 AS INT) AS x,
      |       CAST(MIN(CAST(event_id % 48 AS INT)) % 7 + 1 AS BIGINT) AS label
      |FROM events GROUP BY 1, 2""".stripMargin

  private def tdeContainer(s: SparkSession, d: String): SpatialDataset = {
    val pts = Models.PointsModel.parse(tdePoints(s, d))
    SpatialDataset(s, Seq(
      SpatialElement(Models.PointsModel.meta("pts",
        transforms = Map("global" -> TranslationT(Seq(5.0, -3.0), Seq("x", "y")))), pts),
      SpatialElement(ElementMeta("lab", ElementKind.Labels, dims = Seq("y", "x"),
        transforms = Map("global" -> ScaleT(Seq(2.0, 2.0), Seq("x", "y")))),
        tdeLabels(s, d))))
  }

  // oracle CTE mirroring containerExtent + _compute_target_dimensions math
  // for tdeContainer: extents per element, corners through the transforms,
  // envelope, then W=100-derived scale factors
  private val extentCte =
    s"""pe AS (SELECT min(x) AS x0, min(y) AS y0, max(x) AS x1, max(y) AS y1
       |       FROM ($tdePointsSql)),
       |le AS (SELECT CAST(min(x) AS DOUBLE) AS x0, CAST(min(y) AS DOUBLE) AS y0,
       |              CAST(max(x) AS DOUBLE) AS x1, CAST(max(y) AS DOUBLE) AS y1
       |       FROM ($tdeLabelsSql)),
       |m AS (
       |  SELECT LEAST((1.0*pe.x0 + 0.0*pe.y0) + 5.0, (2.0*le.x0 + 0.0*le.y0) + 0.0) AS xmin,
       |         LEAST((0.0*pe.x0 + 1.0*pe.y0) + -3.0, (0.0*le.x0 + 2.0*le.y0) + 0.0) AS ymin,
       |         GREATEST((1.0*pe.x1 + 0.0*pe.y1) + 5.0, (2.0*le.x1 + 0.0*le.y1) + 0.0) AS xmax,
       |         GREATEST((0.0*pe.x1 + 1.0*pe.y1) + -3.0, (0.0*le.x1 + 2.0*le.y1) + 0.0) AS ymax
       |  FROM pe, le),
       |dims AS (
       |  SELECT xmin, ymin, xmax, ymax,
       |    CAST(FLOOR(100 / ((xmax - xmin) / (ymax - ymin)) + 0.5) AS INT) AS th,
       |    100 / (xmax - xmin) AS sx,
       |    CAST(FLOOR(100 / ((xmax - xmin) / (ymax - ymin)) + 0.5) AS INT) / (ymax - ymin) AS sy,
       |    (xmax - xmin) / 100 AS rsx,
       |    (ymax - ymin) / CAST(FLOOR(100 / ((xmax - xmin) / (ymax - ymin)) + 0.5) AS INT) AS rsy
       |  FROM m)""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // rasterize a 2-level pyramid through a Scale(4) transform into a
    // 20x20 target over the full extent: the sqrt(2)-slack heuristic must
    // choose level 1 (the coarsest with >= 20*sqrt(2) px per axis)
    "q65_pyramid_heuristic" -> ((s, d) => {
      val pyr = RasterOps.buildPyramid(pixels(s, d), levels = 1)
      val (res, lvl) = RasterOps.rasterizeRaster(pyr, "value",
        ScaleT(Seq(4.0, 4.0), Seq("x", "y")),
        Seq(0.0, 0.0), Seq(256.0, 256.0), targetWidth = 20, targetHeight = 20,
        numLevels = 2, keepCols = Seq("c"))
      require(lvl == 1, s"heuristic picked level $lvl, expected 1")
      res.orderBy("y", "x")
    }),

    // transform_to_data_extent: vector side — points shifted/scaled onto
    // the [0,100) x [0,th) pixel frame of the container extent
    "q66_tde_points" -> ((s, d) => {
      val out = TransformExtent.transformToDataExtent(tdeContainer(s, d),
        "global", targetWidth = 100)
      require(out.manifest.element("pts").transforms == Map("global" -> IdentityT))
      out("pts").select("l_orderkey", "l_linenumber", "x", "y")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // transform_to_data_extent: raster side — labels resampled onto the
    // same pixel frame by inverse-affine gather
    "q67_tde_labels" -> ((s, d) => {
      val out = TransformExtent.transformToDataExtent(tdeContainer(s, d),
        "global", targetWidth = 100)
      out("lab").orderBy("y", "x")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    // level-1 raster = avg over 2x2 blocks of present pixels; gather:
    // src = floor(((1/8) * (256/20)) * (coord + 0.5)) with the zero terms
    // kept to mirror the driver's composed-coefficient arithmetic
    "q65_pyramid_heuristic" ->
      s"""WITH px0 AS ($pixelsSql),
         |px1 AS (
         |  SELECT 0 AS c, CAST(y // 2 AS INT) AS y, CAST(x // 2 AS INT) AS x,
         |         AVG(value) AS value
         |  FROM px0 GROUP BY 2, 3),
         |grid AS (SELECT CAST(id // 20 AS INT) AS yo, CAST(id % 20 AS INT) AS xo
         |         FROM range(400) t(id)),
         |g AS (
         |  SELECT yo, xo,
         |    CAST(FLOOR(((1.0/8.0) * (256.0/20.0)) * (CAST(xo AS DOUBLE) + 0.5)
         |      + 0.0 * (CAST(yo AS DOUBLE) + 0.5) + 0.0) AS INT) AS xs,
         |    CAST(FLOOR(0.0 * (CAST(xo AS DOUBLE) + 0.5)
         |      + ((1.0/8.0) * (256.0/20.0)) * (CAST(yo AS DOUBLE) + 0.5) + 0.0) AS INT) AS ys
         |  FROM grid)
         |SELECT px1.c, g.yo AS y, g.xo AS x, px1.value
         |FROM g JOIN px1 ON px1.y = g.ys AND px1.x = g.xs
         |ORDER BY y, x""".stripMargin,
    // x' = (sx*x + 0*y) + (sx*5 + sx*(-xmin)): the Sequence matrix product
    // accumulates the translation terms as separate sx-products, so the
    // oracle keeps them separate too (sx*(5 - xmin) would differ in IEEE)
    "q66_tde_points" ->
      s"""WITH $extentCte
         |SELECT p.l_orderkey, p.l_linenumber,
         |  (d.sx * p.x + 0.0 * p.y) + (d.sx * 5.0 + d.sx * (-d.xmin)) AS x,
         |  (0.0 * p.x + d.sy * p.y) + (d.sy * (-3.0) + d.sy * (-d.ymin)) AS y
         |FROM ($tdePointsSql) p, dims d
         |ORDER BY p.l_orderkey, p.l_linenumber""".stripMargin,
    // src = floor((0.5*sx)*(xo+0.5) + 0 + ((0.5*xmin + 0.0*ymin) + 0.0))
    "q67_tde_labels" ->
      s"""WITH $extentCte,
         |lab AS ($tdeLabelsSql),
         |grid AS (
         |  SELECT CAST(t.id // 100 AS INT) AS yo, CAST(t.id % 100 AS INT) AS xo
         |  FROM range(40000) t(id), dims d WHERE t.id < 100 * d.th),
         |g AS (
         |  SELECT yo, xo,
         |    CAST(FLOOR((0.5 * d.rsx) * (CAST(xo AS DOUBLE) + 0.5)
         |      + (0.0 * d.rsy) * (CAST(yo AS DOUBLE) + 0.5)
         |      + ((0.5 * d.xmin + 0.0 * d.ymin) + 0.0)) AS INT) AS xs,
         |    CAST(FLOOR((0.0 * d.rsx) * (CAST(xo AS DOUBLE) + 0.5)
         |      + (0.5 * d.rsy) * (CAST(yo AS DOUBLE) + 0.5)
         |      + ((0.0 * d.xmin + 0.5 * d.ymin) + 0.0)) AS INT) AS ys
         |  FROM grid, dims d)
         |SELECT g.yo AS y, g.xo AS x, lab.label
         |FROM g JOIN lab ON lab.y = g.ys AND lab.x = g.xs
         |ORDER BY y, x""".stripMargin
  )
}
