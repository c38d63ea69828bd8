package graft.queries

import graft.{QueryPack, Tables}
import graft.geom.st._
import graft.model._
import graft.ops.Aggregate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation-layer correctness-gate queries (SURVEY.md §2.5): the spatial
  * join + groupBy paths, zonal statistics, centroids, extent, concat.
  *
  * Floating-point discipline: non-integral double values are cast to exact
  * decimals BEFORE aggregation (partial-agg order would otherwise flip low
  * bits vs the oracle); integral-valued doubles (counts, pixel coords, TPC-H
  * quantities) sum exactly in IEEE and need no cast.
  */
object AggregatePack extends QueryPack {

  private def points(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      (col("l_extendedprice") / 1000.0).as("x"),
      col("l_quantity").as("y"),
      col("l_returnflag").as("category"))

  private val pointsSql =
    "SELECT l_extendedprice / 1000.0 AS x, l_quantity AS y, l_returnflag AS category FROM lineitem"

  private def circles(s: SparkSession, d: String): DataFrame =
    Models.ShapesModel.parse(
      Tables.supplier(s, d).select(
        col("s_suppkey").as("index"),
        (col("s_acctbal") / 100.0).as("cx"),
        col("s_suppkey").cast("double").as("cy"),
        (lit(5.0) + (col("s_suppkey") % 7).cast("double")).as("radius"))
        .withColumn("geometry", st_point(col("cx"), col("cy")))
        .withColumn("geom_type", lit("circle")),
      radiusCol = Some("radius"))

  private val circlesSql =
    """SELECT s_suppkey AS index, s_acctbal / 100.0 AS cx, CAST(s_suppkey AS DOUBLE) AS cy,
      |  5.0 + CAST(s_suppkey % 7 AS DOUBLE) AS radius FROM supplier""".stripMargin

  // axis-aligned integer boxes for shapes-by-shapes (box-box intersection is
  // SQL-expressible; integer coords keep shoelace/clip arithmetic exact)
  private def byBoxes(s: SparkSession, d: String): DataFrame =
    Models.ShapesModel.parse(
      Tables.supplier(s, d).select(
        col("s_suppkey").as("index"),
        ((col("s_suppkey") * 7) % 50).cast("double").as("x0"),
        ((col("s_suppkey") * 3) % 40).cast("double").as("y0"))
        .withColumn("geometry",
          st_make_box(col("x0"), col("y0"), col("x0") + 8.0, col("y0") + 6.0))
        .withColumn("geom_type", lit("polygon")))

  private def valBoxes(s: SparkSession, d: String): DataFrame =
    Models.ShapesModel.parse(
      Tables.customer(s, d).select(
        col("c_custkey").as("index"),
        ((col("c_custkey") * 5) % 60).cast("double").as("x0"),
        ((col("c_custkey") * 11) % 45).cast("double").as("y0"),
        col("c_acctbal").as("value"))
        .withColumn("geometry",
          st_make_box(col("x0"), col("y0"), col("x0") + 4.0, col("y0") + 4.0))
        .withColumn("geom_type", lit("polygon")))

  private val byBoxesSql =
    """SELECT s_suppkey AS index, CAST((s_suppkey * 7) % 50 AS DOUBLE) AS x0,
      |  CAST((s_suppkey * 3) % 40 AS DOUBLE) AS y0 FROM supplier""".stripMargin
  private val valBoxesSql =
    """SELECT c_custkey AS index, CAST((c_custkey * 5) % 60 AS DOUBLE) AS x0,
      |  CAST((c_custkey * 11) % 45 AS DOUBLE) AS y0, c_acctbal AS value FROM customer""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // aggregate(points, by=circles, count + sum) — broadcast spatial join +
    // hash aggregate (aggregate.py:312-493; circle test is pure arithmetic).
    "q20_aggregate_points_by_circles" -> ((s, d) => {
      // grid-bucketed join (cell ~ max radius): same pairs as broadcast,
      // cell-local exact predicate instead of all-pairs nested loop
      Aggregate.pointsByShapes(points(s, d), circles(s, d),
        valueKey = Some("y"), aggFunc = "sum", grid = Some(16.0))
        .orderBy(col("region_id"))
    }),

    // categorical aggregation -> long-form X (count per region x category,
    // aggregate.py:454-488).
    "q21_aggregate_categorical" -> ((s, d) => {
      Aggregate.pointsByShapesCategorical(points(s, d), circles(s, d), "category",
        grid = Some(16.0))
        .orderBy(col("region_id"), col("var_name"))
    }),

    // zonal statistics: pixels joined to a label grid, sum per (label,
    // channel) through exact decimals (aggregate.py:248-309).
    "q22_zonal_stats" -> ((s, d) => {
      val pixels = Tables.events(s, d).select(
        (col("event_id") % 2).cast("int").as("c"),
        (col("event_id") % 64).cast("int").as("y"),
        (col("user_id") % 64).cast("int").as("x"),
        col("value").cast("decimal(28,6)").as("value"))
      val labels = s.range(64 * 64).select(
        (col("id") / 64).cast("int").as("y"),
        (col("id") % 64).cast("int").as("x"),
        (col("id") % 15).as("label"))
      Aggregate.imageByLabels(pixels, labels, "sum")
        .withColumn("value", col("value").cast("double"))
        .orderBy(col("label"), col("c"))
    }),

    // labels centroids: mean pixel coordinate per label, background dropped
    // (centroids.py:58-102).
    "q23_centroids_labels" -> ((s, d) => {
      val labels = Tables.events(s, d).select(
        (col("event_id") % 128).cast("int").as("y"),
        (col("user_id") % 128).cast("int").as("x"),
        (col("event_id") % 7).as("label"))
      Aggregate.labelCentroids(labels).orderBy(col("label"))
    }),

    // container extent across points + circles with a translation transform
    // (data_extent.py:169-239; corners transformed on the driver).
    "q24_extent_container" -> ((s, d) => {
      val pts = Models.PointsModel.parse(points(s, d))
      val sd = SpatialDataset(s, Seq(
        SpatialElement(Models.PointsModel.meta("pts",
          transforms = Map("global" -> TranslationT(Seq(3.5, -2.0), Seq("x", "y")))), pts),
        SpatialElement(Models.ShapesModel.meta("circ"), circles(s, d))))
      val (xmin, ymin, xmax, ymax) = Aggregate.containerExtent(sd, "global")
      import s.implicits._
      Seq((xmin, ymin, xmax, ymax)).toDF("xmin", "ymin", "xmax", "ymax")
    }),

    // table concat with missing-column null fill (concatenate.py:28-78).
    "q25_concat_tables" -> ((s, d) => {
      val a = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), lit("a").as("region"))
      val b = Tables.customer(s, d).filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey"), lit("b").as("region"), col("c_acctbal").as("extra"))
      val t = Aggregate.concatTables(Seq(
        SpatialElement(Models.TableModel.meta("t1", None), a),
        SpatialElement(Models.TableModel.meta("t2", None), b)), "both")
      t.data.orderBy(col("region"), col("c_custkey"))
    }),

    // shapes-by-shapes: box-box intersection join + sum (aggregate.py:423-452)
    // via the grid-bucketed path (the big-by-big strategy; broadcast variant
    // is pinned equivalent in AggregateSpec).
    "q26_shapes_by_shapes" -> ((s, d) => {
      val vals = valBoxes(s, d).withColumn("value", col("value").cast("decimal(28,6)"))
      Aggregate.shapesByShapes(byBoxes(s, d), vals, "value", "sum",
        gridCell = Some(8.0))
        .withColumn("value", col("value").cast("double"))
        .orderBy(col("region_id"))
    }),

    // general (NON-convex) intersection areas: L-shaped regions against
    // value boxes through the ear-triangulation kernel; the oracle verifies
    // with exact union-of-rectangles algebra (iA + iB - iAB)
    "q71_nonconvex_intersection" -> ((s, d) => {
      val lShapes = Models.ShapesModel.parse(
        Tables.supplier(s, d).select(
          col("s_suppkey").as("index"),
          ((col("s_suppkey") * 7) % 50).cast("double").as("x0"),
          ((col("s_suppkey") * 3) % 40).cast("double").as("y0"))
          .withColumn("geometry", graft.geom.st.st_make_l_shape(
            col("x0"), col("y0"), lit(8.0), lit(3.0), lit(4.0), lit(6.0)))
          .withColumn("geom_type", lit("polygon"))
          .drop("x0", "y0"))
      val vals = valBoxes(s, d)
      graft.ops.SpatialJoin.shapesIntersectShapesGrid(lShapes, vals, 8.0,
          withIntersectionArea = true, assumeConvexBy = false)
        .filter(col("intersection_area") > 0)
        .select(col("region_id"), col("value_id"),
          round(col("intersection_area"), 6).as("inter_area"))
        .orderBy(col("region_id"), col("value_id"))
    }),

    // landmark alignment: the similarity fit over exactly-corresponding
    // landmark pairs recovers the generating transform to float precision
    // (operations.py:347-445); applied coordinates match the ground truth
    "q89_landmark_alignment" -> ((s, d) => {
      val mov = Tables.supplier(s, d).filter(col("s_suppkey") <= 10).select(
        ((col("s_suppkey") * 3) % 17).cast("double").as("x"),
        ((col("s_suppkey") * 5) % 13).cast("double").as("y"))
      val (c0, s0) = (math.cos(0.5), math.sin(0.5))
      val refs = mov.select(
        (lit(1.5) * (lit(c0) * col("x") - lit(s0) * col("y")) + 3.0).as("x"),
        (lit(1.5) * (lit(s0) * col("x") + lit(c0) * col("y")) - 2.0).as("y"))
      val t = graft.ops.Landmarks.transformationBetweenLandmarks(refs, mov)
      val m = t.matrix
      val pts = Tables.supplier(s, d).select(
        ((col("s_suppkey") * 7) % 50).cast("double").as("x"),
        ((col("s_suppkey") * 3) % 40).cast("double").as("y"))
      pts.select(
        round(lit(m(0, 0)) * col("x") + lit(m(0, 1)) * col("y") + lit(m(0, 2)), 6).as("tx"),
        round(lit(m(1, 0)) * col("x") + lit(m(1, 1)) * col("y") + lit(m(1, 2)), 6).as("ty"))
        .agg(count(lit(1)).as("n"),
          sum(col("tx").cast("decimal(28,6)")).cast("double").as("sum_x"),
          sum(col("ty").cast("decimal(28,6)")).cast("double").as("sum_y"))
    }),

    // bounding_box_query on shapes through a scale transform: coarse
    // envelope prefilter + exact box intersects (spatial_query.py:746-800)
    "q87_bbox_shapes" -> ((s, d) => {
      // target box (20,10)-(68,50) under Scale(2,2) = intrinsic (10,5)-(34,25)
      graft.query.SpatialQuery.boundingBoxShapes(byBoxes(s, d),
          graft.model.ScaleT(Seq(2.0, 2.0), Seq("x", "y")),
          Seq(20.0, 10.0), Seq(68.0, 50.0))
        .select(col("index"))
        .orderBy("index")
    }),

    // polygon_query(clip=True) with a REFLEX clip polygon: the clipped
    // geometry comes from convex decomposition (st_clip) and its areas must
    // reproduce exact union-of-rectangles algebra (spatial_query.py:958-963)
    "q84_nonconvex_clip" -> ((s, d) => {
      // L-shape clip: [10,40]x[5,17] U [10,26]x[5,29] (reflex at (26,17))
      val lWkb = graft.geom.GeomKernel.makeLShape(10.0, 5.0, 30.0, 12.0, 16.0, 24.0)
      graft.query.SpatialQuery.polygonQueryShapes(
          valBoxes(s, d), graft.model.IdentityT, lWkb, clip = true)
        .select(col("index"), round(st_area(col("geometry")), 6).as("clip_area"))
        .orderBy("index")
    }),

    // polygon_query(clip=True) with a HOLED clip polygon (donut): clipped
    // geometry comes from the trapezoid-band decomposition (st_clip) and
    // its areas must reproduce exact rectangle algebra ext - hole — the
    // reference clips by arbitrary shapely geometry (spatial_query.py:958-963)
    "q119_donut_clip" -> ((s, d) => {
      // donut: exterior [10,40]x[5,29] minus hole [18,30]x[12,22]
      val donut = graft.geom.WKB.write(graft.geom.GPolygon(Array(
        Array(10.0, 5.0, 40.0, 5.0, 40.0, 29.0, 10.0, 29.0),
        Array(18.0, 12.0, 30.0, 12.0, 30.0, 22.0, 18.0, 22.0))))
      graft.query.SpatialQuery.polygonQueryShapes(
          valBoxes(s, d), graft.model.IdentityT, donut, clip = true)
        .select(col("index"), round(st_area(col("geometry")), 6).as("clip_area"))
        .orderBy("index")
    }),

    // fractions=True: value weighted by intersection_area / value_area
    // through the convex-clip kernel (aggregate.py:429-450), grid path.
    "q27_shapes_fractions" -> ((s, d) => {
      val vals = valBoxes(s, d)
      Aggregate.shapesByShapes(byBoxes(s, d), vals, "value", "sum",
        fractions = true, gridCell = Some(8.0))
        .withColumn("value", round(col("value"), 6))
        .orderBy(col("region_id"))
    })
  )

  override def oracleSql: Map[String, String] = {
    val joinCircles =
      s"""FROM ($pointsSql) p JOIN ($circlesSql) c
         |ON p.x >= c.cx - c.radius AND p.x <= c.cx + c.radius
         |AND p.y >= c.cy - c.radius AND p.y <= c.cy + c.radius
         |AND (p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy) <= c.radius * c.radius""".stripMargin
    val boxJoin =
      s"""FROM ($valBoxesSql) v JOIN ($byBoxesSql) b
         |ON b.x0 <= v.x0 + 4.0 AND v.x0 <= b.x0 + 8.0
         |AND b.y0 <= v.y0 + 4.0 AND v.y0 <= b.y0 + 6.0""".stripMargin
    Map(
      "q20_aggregate_points_by_circles" ->
        s"""SELECT c.index AS region_id, SUM(p.y) AS value
           |$joinCircles
           |GROUP BY c.index ORDER BY region_id""".stripMargin,
      "q21_aggregate_categorical" ->
        s"""SELECT c.index AS region_id, p.category AS var_name, COUNT(*) AS value
           |$joinCircles
           |GROUP BY c.index, p.category ORDER BY region_id, var_name""".stripMargin,
      "q22_zonal_stats" ->
        """SELECT g.label, px.c, CAST(SUM(CAST(px.value AS DECIMAL(28,6))) AS DOUBLE) AS value
          |FROM (SELECT CAST(event_id % 2 AS INT) AS c, CAST(event_id % 64 AS INT) AS y,
          |        CAST(user_id % 64 AS INT) AS x, value FROM events) px
          |JOIN (SELECT CAST(id // 64 AS INT) AS y, CAST(id % 64 AS INT) AS x, id % 15 AS label
          |      FROM range(4096) t(id)) g
          |  ON px.y = g.y AND px.x = g.x
          |WHERE g.label <> 0
          |GROUP BY g.label, px.c ORDER BY g.label, px.c""".stripMargin,
      "q23_centroids_labels" ->
        """SELECT label, AVG(y) AS y, AVG(x) AS x FROM (
          |  SELECT CAST(event_id % 128 AS INT) AS y, CAST(user_id % 128 AS INT) AS x,
          |         event_id % 7 AS label FROM events)
          |WHERE label <> 0 GROUP BY label ORDER BY label""".stripMargin,
      // corners transformed exactly like the driver: 1.0*v + 0.0*w + shift
      "q24_extent_container" ->
        s"""WITH pe AS (SELECT min(x) AS x0, min(y) AS y0, max(x) AS x1, max(y) AS y1
           |            FROM ($pointsSql)),
           |     ce AS (SELECT min(cx - radius) AS x0, min(cy - radius) AS y0,
           |                   max(cx + radius) AS x1, max(cy + radius) AS y1
           |            FROM ($circlesSql))
           |SELECT LEAST(1.0*pe.x0 + 0.0*pe.y0 + 3.5, ce.x0) AS xmin,
           |       LEAST(0.0*pe.x0 + 1.0*pe.y0 + -2.0, ce.y0) AS ymin,
           |       GREATEST(1.0*pe.x1 + 0.0*pe.y1 + 3.5, ce.x1) AS xmax,
           |       GREATEST(0.0*pe.x1 + 1.0*pe.y1 + -2.0, ce.y1) AS ymax
           |FROM pe, ce""".stripMargin,
      "q25_concat_tables" ->
        """SELECT c_custkey, 'a' AS region, NULL AS extra FROM customer WHERE c_mktsegment = 'BUILDING'
          |UNION ALL
          |SELECT c_custkey, 'b' AS region, c_acctbal AS extra FROM customer WHERE c_mktsegment = 'MACHINERY'
          |ORDER BY region, c_custkey""".stripMargin,
      "q26_shapes_by_shapes" ->
        s"""SELECT b.index AS region_id,
           |  CAST(SUM(CAST(v.value AS DECIMAL(28,6))) AS DOUBLE) AS value
           |$boxJoin
           |GROUP BY b.index ORDER BY region_id""".stripMargin,
      // L = rect A [x0,x0+8]x[y0,y0+3] ∪ rect B [x0,x0+4]x[y0,y0+6];
      // area(L ∩ box) = iA + iB - i(A∩B) with A∩B = [x0,x0+4]x[y0,y0+3]
      "q71_nonconvex_intersection" -> {
        def ibox(rx0: String, ry0: String, rx1: String, ry1: String) =
          s"""GREATEST(0.0, LEAST($rx1, v.x0 + 4.0) - GREATEST($rx0, v.x0)) *
             |GREATEST(0.0, LEAST($ry1, v.y0 + 4.0) - GREATEST($ry0, v.y0))""".stripMargin
        s"""WITH l AS (
           |  SELECT s_suppkey AS region_id,
           |    CAST((s_suppkey * 7) % 50 AS DOUBLE) AS x0,
           |    CAST((s_suppkey * 3) % 40 AS DOUBLE) AS y0
           |  FROM supplier),
           |v AS ($valBoxesSql),
           |pairs AS (
           |  SELECT l.region_id, v.index AS value_id,
           |    ${ibox("l.x0", "l.y0", "l.x0 + 8.0", "l.y0 + 3.0")} +
           |    ${ibox("l.x0", "l.y0", "l.x0 + 4.0", "l.y0 + 6.0")} -
           |    ${ibox("l.x0", "l.y0", "l.x0 + 4.0", "l.y0 + 3.0")} AS inter
           |  FROM l, v)
           |SELECT region_id, value_id, ROUND(inter, 6) AS inter_area
           |FROM pairs WHERE inter > 0
           |ORDER BY region_id, value_id""".stripMargin
      },
      // ground-truth transform: scale 1.5, rotation 0.5 rad, shift (3,-2)
      "q89_landmark_alignment" ->
        """WITH p AS (
          |  SELECT CAST((s_suppkey * 7) % 50 AS DOUBLE) AS x,
          |         CAST((s_suppkey * 3) % 40 AS DOUBLE) AS y
          |  FROM supplier)
          |SELECT COUNT(*) AS n,
          |  CAST(SUM(CAST(ROUND(1.5 * (COS(0.5) * x - SIN(0.5) * y) + 3.0, 6)
          |    AS DECIMAL(28,6))) AS DOUBLE) AS sum_x,
          |  CAST(SUM(CAST(ROUND(1.5 * (SIN(0.5) * x + COS(0.5) * y) - 2.0, 6)
          |    AS DECIMAL(28,6))) AS DOUBLE) AS sum_y
          |FROM p""".stripMargin,
      // boxes are [x0,x0+8]x[y0,y0+6]; inclusive interval overlap with
      // the intrinsic box (10,5)-(34,25)
      "q87_bbox_shapes" ->
        s"""SELECT index FROM ($byBoxesSql) b
           |WHERE b.x0 <= 34.0 AND b.x0 + 8.0 >= 10.0
           |  AND b.y0 <= 25.0 AND b.y0 + 6.0 >= 5.0
           |ORDER BY index""".stripMargin,
      // L = A [10,40]x[5,17] U B [10,26]x[5,29]; area(L ∩ box) =
      // iA + iB - i(A∩B) with A∩B = [10,26]x[5,17]
      "q84_nonconvex_clip" -> {
        def ibox(rx0: String, ry0: String, rx1: String, ry1: String) =
          s"""GREATEST(0.0, LEAST($rx1, v.x0 + 4.0) - GREATEST($rx0, v.x0)) *
             |GREATEST(0.0, LEAST($ry1, v.y0 + 4.0) - GREATEST($ry0, v.y0))""".stripMargin
        s"""WITH v AS ($valBoxesSql),
           |pairs AS (
           |  SELECT v.index,
           |    ${ibox("10.0", "5.0", "40.0", "17.0")} +
           |    ${ibox("10.0", "5.0", "26.0", "29.0")} -
           |    ${ibox("10.0", "5.0", "26.0", "17.0")} AS inter
           |  FROM v)
           |SELECT index, ROUND(inter, 6) AS clip_area
           |FROM pairs WHERE inter > 0
           |ORDER BY index""".stripMargin
      },
      // donut = ext [10,40]x[5,29] minus hole [18,30]x[12,22];
      // area(donut ∩ box) = ibox(ext) - ibox(hole) (hole lies inside ext)
      "q119_donut_clip" -> {
        def ibox(rx0: String, ry0: String, rx1: String, ry1: String) =
          s"""GREATEST(0.0, LEAST($rx1, v.x0 + 4.0) - GREATEST($rx0, v.x0)) *
             |GREATEST(0.0, LEAST($ry1, v.y0 + 4.0) - GREATEST($ry0, v.y0))""".stripMargin
        s"""WITH v AS ($valBoxesSql),
           |pairs AS (
           |  SELECT v.index,
           |    ${ibox("10.0", "5.0", "40.0", "29.0")} -
           |    ${ibox("18.0", "12.0", "30.0", "22.0")} AS inter
           |  FROM v)
           |SELECT index, ROUND(inter, 6) AS clip_area
           |FROM pairs WHERE inter > 0
           |ORDER BY index""".stripMargin
      },
      "q27_shapes_fractions" ->
        s"""SELECT b.index AS region_id,
           |  ROUND(SUM((v.value * (
           |    GREATEST(0.0, LEAST(v.x0 + 4.0, b.x0 + 8.0) - GREATEST(v.x0, b.x0)) *
           |    GREATEST(0.0, LEAST(v.y0 + 4.0, b.y0 + 6.0) - GREATEST(v.y0, b.y0))
           |  )) / 16.0), 6) AS value
           |$boxJoin
           |GROUP BY b.index ORDER BY region_id""".stripMargin
    )
  }
}
