package graft.queries

import graft.{QueryPack, Tables}
import graft.geom.{GPolygon, WKB}
import graft.geom.st._
import graft.model._
import graft.query.{RelationalQuery, SpatialQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial-layer correctness-gate queries.
  *
  * The driver tables have no geometry, so each query derives a deterministic
  * spatial interpretation (points from lineitem metrics, circles from
  * supplier rows, labels from events) IN BOTH the Spark pipeline and the
  * DuckDB oracle — byte-identical doubles on both sides, so the spatial
  * kernels are exercised against closed-form SQL.
  */
object SpatialPack extends QueryPack {

  // lineitem-derived points: x = extendedprice/1000 (IEEE-identical in
  // DuckDB), y = quantity, id = (orderkey, linenumber)
  private def points(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") / 1000.0).as("x"),
      col("l_quantity").as("y"))

  private val pointsSql =
    "SELECT l_orderkey, l_linenumber, l_extendedprice / 1000.0 AS x, l_quantity AS y FROM lineitem"

  // Query triangle with off-grid vertices (CCW) — avoids exact-boundary
  // IEEE coin flips between the ray-cast kernel and the SQL half-planes.
  private val tri = Array(10.17, 9.93, 40.03, 10.11, 9.97, 40.41)

  private def halfPlaneSql(ring: Array[Double]): String = {
    val n = ring.length / 2
    (0 until n).map { i =>
      val j = (i + 1) % n
      val (x1, y1, x2, y2) = (ring(2 * i), ring(2 * i + 1), ring(2 * j), ring(2 * j + 1))
      s"(($x2 - $x1) * (y - $y1) - ($y2 - $y1) * (x - $x1)) >= 0"
    }.mkString(" AND ")
  }

  // supplier-derived circles: center (acctbal/100, suppkey), radius 1+suppkey%5
  private def circles(s: SparkSession, d: String): DataFrame = {
    val sup = Tables.supplier(s, d).select(
      col("s_suppkey").as("index"),
      (col("s_acctbal") / 100.0).as("cx"),
      col("s_suppkey").cast("double").as("cy"),
      (lit(1.0) + (col("s_suppkey") % 5).cast("double")).as("radius"))
    Models.ShapesModel.parse(
      sup.withColumn("geometry", st_point(col("cx"), col("cy")))
        .withColumn("geom_type", lit("circle")),
      radiusCol = Some("radius"))
  }

  private val circlesSql =
    """SELECT s_suppkey AS index, s_acctbal / 100.0 AS cx, CAST(s_suppkey AS DOUBLE) AS cy,
      |  1.0 + CAST(s_suppkey % 5 AS DOUBLE) AS radius FROM supplier""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // get_bounding_box_corners (query/_utils.py:18-91): the reference's
    // exact 2D/3D vertex ORDER is the contract (polygon clipping and
    // box-transform math both consume it); region count binds the sf dir
    "q196_bbox_corners" -> ((s, d) => {
      import s.implicits._
      val nRegion = Tables.region(s, d).count()
      val c2 = SpatialQuery.boundingBoxCorners(
        Seq("x", "y"), Seq(2.0, 3.0), Seq(10.0, 7.0))
      val c3 = SpatialQuery.boundingBoxCorners(
        Seq("x", "y", "z"), Seq(0.0, 1.0, 2.0), Seq(4.0, 5.0, 6.0))
      val rows =
        c2.zipWithIndex.map { case (c, i) =>
          (2, i, c(0), c(1), Option.empty[Double]) } ++
        c3.zipWithIndex.map { case (c, i) =>
          (3, i, c(0), c(1), Some(c(2))) }
      rows.toDF("dim", "idx", "x", "y", "z")
        .withColumn("n_region", lit(nRegion))
        .orderBy(col("dim"), col("idx"))
    }),

    // Bounded-radius KNN join (grid form): ~1/401 of the points probe the
    // full point set for their 5 nearest neighbors within radius 1 —
    // candidates meet in the probe's 3x3 cell stencil (plain equi-join on
    // the cell id, no product), exact IEEE dist2 + (dist2, pid) ranking.
    "q219_knn_join" -> ((s, d) => {
      val pts = points(s, d)
        .withColumn("pid", col("l_orderkey") * 8 + col("l_linenumber"))
        .select(col("pid"), col("x"), col("y"))
      val q = pts.filter(col("pid") % 401 === 1)
        .select(col("pid").as("qid"), col("x").as("qx"), col("y").as("qy"))
      graft.ops.SpatialJoin.knnWithinRadiusGrid(q, pts, k = 5, radius = 1.0)
        .orderBy(col("qid"), col("knn_rank"))
    }),

    // IDW (Shepard p=2) interpolation at off-grid probes: kNN candidates
    // from the grid join, exact-IEEE 1/dist2 weights snapped + decimal-
    // summed; probes sit 0.25 off the integer quantity grid so dist2 is
    // bounded below (weights can't blow past the snap grid)
    "q346_idw" -> ((s, d) => {
      // (orderkey, linenumber) is NOT unique in the driver generator —
      // idwInterpolate requires unique sample ids, so collapse per pid
      val pts = Tables.lineitem(s, d).select(
        (col("l_orderkey") * 8 + col("l_linenumber")).as("pid"),
        (col("l_extendedprice") / 1000.0).as("x"),
        col("l_quantity").as("y"),
        (col("l_partkey") % 50).cast("double").as("v"))
        .groupBy(col("pid"))
        .agg(min(col("x")).as("x"), min(col("y")).as("y"), min(col("v")).as("v"))
      val q = pts.filter(col("pid") % 401 === 1)
        .select(col("pid").as("qid"),
          (col("x") + 0.25).as("qx"), (col("y") + 0.25).as("qy"))
      graft.ops.SpatialJoin.idwInterpolate(q, pts, k = 8, radius = 2.0)
        .orderBy(col("qid"))
    }),

    // Identity-cs bounding box on points: exclusive bounds, range predicate
    // pushed to the parquet scan (spatial_query.py:668-701 fast path).
    "q10_bbox_points_identity" -> ((s, d) => {
      SpatialQuery.boundingBoxPoints(points(s, d), IdentityT,
        Seq("x", "y"), Seq(10.0, 10.0), Seq(40.0, 40.0))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Diagonal (scale+translation) transform: box inverted on the driver,
    // still a raw range predicate (interval inversion, :681-701).
    "q11_bbox_points_scale" -> ((s, d) => {
      val t = SequenceT(List(
        ScaleT(Seq(2.0, 4.0), Seq("x", "y")),
        TranslationT(Seq(5.0, -3.0), Seq("x", "y"))))
      SpatialQuery.boundingBoxPoints(points(s, d), t,
        Seq("x", "y"), Seq(20.0, 20.0), Seq(80.0, 80.0))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // General affine (90° rotation + shift): predicate on projected coords
    // (spatial_query.py:702-714).
    "q12_bbox_points_affine" -> ((s, d) => {
      val rot = AffineT(Matrix(3, 3, Array(0, -1, 2, 1, 0, 0, 0, 0, 1)),
        Seq("x", "y"), Seq("x", "y"))
      SpatialQuery.boundingBoxPoints(points(s, d), rot,
        Seq("x", "y"), Seq(-38.0, 10.0), Seq(-8.0, 40.0))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Polygon query on points: bbox prefilter + exact ray-cast
    // (spatial_query.py:895-923).
    "q13_polygon_query_points" -> ((s, d) => {
      val poly = WKB.write(GPolygon(Array(tri)))
      SpatialQuery.polygonQueryPoints(points(s, d), IdentityT, poly)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Circle -> n-gon buffer, shoelace area + centroid vs closed forms
    // (vectorize.py:273-293 buffer; centroids.py:108-126).
    "q14_circle_ngon_stats" -> ((s, d) => {
      val c = circles(s, d)
      c.withColumn("ngon", st_buffer_point(st_centroid_x(col("geometry")),
          st_centroid_y(col("geometry")), col("radius"), lit(16)))
        .select(
          col("index"),
          round(st_area(col("ngon")), 6).as("area"),
          round(st_centroid_x(col("ngon")), 6).as("ctr_x"),
          round(st_centroid_y(col("ngon")), 6).as("ctr_y"))
        .orderBy(col("index"))
    }),

    // Extent of circles: min/max over center ± radius
    // (data_extent.py:24-54).
    "q15_extent_circles" -> ((s, d) => {
      circles(s, d).agg(
        min(col("minx")).as("xmin"), min(col("miny")).as("ymin"),
        max(col("maxx")).as("xmax"), max(col("maxy")).as("ymax"))
    }),

    // Labels bbox query: inclusive integer slice semantics
    // (query/_utils.py:94-109).
    "q16_labels_bbox" -> ((s, d) => {
      val lbl = Models.LabelsModel.parse(
        Tables.events(s, d).select(
          (col("event_id") % 128).cast("int").as("y"),
          (col("user_id") % 128).cast("int").as("x"),
          (col("event_id") % 7 + 1).as("label")))
      SpatialQuery.boundingBoxLabels(lbl, IdentityT, Seq("y", "x"),
        Seq(10.2, 0.8), Seq(90.5, 100.1))
        .orderBy(col("y"), col("x"), col("label"))
    }),

    // Container-level bbox query with table cascade: filtered points drive a
    // left-semi join on the annotating table (query/_utils.py:199-231).
    "q17_bbox_filter_table" -> ((s, d) => {
      val pts = points(s, d).withColumnRenamed("l_orderkey", "instance_id")
      val obs = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), lit("pts").as("region"))
      val sd = SpatialDataset(s, Seq(
        SpatialElement(Models.PointsModel.meta("pts",
          instanceKey = Some("instance_id")), pts),
        SpatialElement(Models.TableModel.meta("tbl",
          Some(TableAnnotation(Seq("pts"), "region", "o_orderkey"))), obs)))
      SpatialQuery.boundingBox(sd, Seq("x", "y"), Seq(10.0, 10.0), Seq(15.0, 20.0),
        targetCs = "global", filterTable = true)
        .element("tbl").obs
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    })
  )

  override def oracleSql: Map[String, String] = {
    val pts = pointsSql
    Map(
      "q196_bbox_corners" ->
        """WITH nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_region FROM region),
          |c AS (
          |  SELECT 2 AS dim, 0 AS idx, 2.0 AS x, 3.0 AS y, CAST(NULL AS DOUBLE) AS z
          |  UNION ALL SELECT 2, 1, 2.0, 7.0, NULL
          |  UNION ALL SELECT 2, 2, 10.0, 7.0, NULL
          |  UNION ALL SELECT 2, 3, 10.0, 3.0, NULL
          |  UNION ALL SELECT 3, 0, 0.0, 1.0, 2.0
          |  UNION ALL SELECT 3, 1, 0.0, 1.0, 6.0
          |  UNION ALL SELECT 3, 2, 0.0, 5.0, 6.0
          |  UNION ALL SELECT 3, 3, 0.0, 5.0, 2.0
          |  UNION ALL SELECT 3, 4, 4.0, 1.0, 2.0
          |  UNION ALL SELECT 3, 5, 4.0, 1.0, 6.0
          |  UNION ALL SELECT 3, 6, 4.0, 5.0, 6.0
          |  UNION ALL SELECT 3, 7, 4.0, 5.0, 2.0)
          |SELECT c.dim, c.idx, c.x, c.y, c.z, nr.n_region
          |FROM c, nr ORDER BY dim, idx""".stripMargin,
      "q10_bbox_points_identity" ->
        s"""SELECT * FROM ($pts)
           |WHERE x > 10.0 AND x < 40.0 AND y > 10.0 AND y < 40.0
           |ORDER BY l_orderkey, l_linenumber""".stripMargin,
      // brute-force KNN ground truth: the oracle never sees the grid
      "q219_knn_join" ->
        s"""WITH p AS (SELECT l_orderkey * 8 + l_linenumber AS pid,
           |    l_extendedprice / 1000.0 AS x, l_quantity AS y FROM lineitem),
           |q AS (SELECT pid AS qid, x AS qx, y AS qy FROM p WHERE pid % 401 = 1),
           |cand AS (
           |  SELECT qid, pid, (qx - x) * (qx - x) + (qy - y) * (qy - y) AS dist2
           |  FROM q JOIN p ON (qx - x) * (qx - x) + (qy - y) * (qy - y) <= 1.0)
           |SELECT qid, pid, dist2, CAST(rnk AS INT) AS knn_rank FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2, pid) AS rnk
           |  FROM cand)
           |WHERE rnk <= 5 ORDER BY qid, knn_rank""".stripMargin,
      // brute-force kNN then the same snapped Shepard weights; nearest
      // value picked at rnk=1 (the engine's min_by(v, (dist2,pid)))
      "q346_idw" ->
        s"""WITH p AS (
           |  SELECT pid, MIN(x) AS x, MIN(y) AS y, MIN(v) AS v FROM (
           |    SELECT l_orderkey * 8 + l_linenumber AS pid,
           |      l_extendedprice / 1000.0 AS x, l_quantity AS y,
           |      CAST(l_partkey % 50 AS DOUBLE) AS v FROM lineitem)
           |  GROUP BY pid),
           |q AS (SELECT pid AS qid, x + 0.25 AS qx, y + 0.25 AS qy
           |      FROM p WHERE pid % 401 = 1),
           |cand AS (
           |  SELECT qid, pid, v,
           |    (qx - x) * (qx - x) + (qy - y) * (qy - y) AS dist2
           |  FROM q JOIN p ON (qx - x) * (qx - x) + (qy - y) * (qy - y) <= 4.0),
           |top AS (
           |  SELECT * FROM (
           |    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2, pid) AS rnk
           |    FROM cand)
           |  WHERE rnk <= 8),
           |agg AS (
           |  SELECT qid, COUNT(*) AS n_neighbors, MIN(dist2) AS d0,
           |    MAX(CASE WHEN rnk = 1 THEN v END) AS vnear,
           |    CAST(SUM(CAST(CASE WHEN dist2 > 0
           |      THEN FLOOR(v / dist2 * 1e6 + 0.5) / 1e6 ELSE 0.0 END
           |      AS DECIMAL(38,6))) AS DOUBLE) AS num,
           |    CAST(SUM(CAST(CASE WHEN dist2 > 0
           |      THEN FLOOR(1.0 / dist2 * 1e6 + 0.5) / 1e6 ELSE 0.0 END
           |      AS DECIMAL(38,6))) AS DOUBLE) AS den
           |  FROM top GROUP BY qid)
           |SELECT qid, n_neighbors,
           |  CASE WHEN d0 = 0 THEN vnear
           |       ELSE FLOOR(num / den * 1e6 + 0.5) / 1e6 END AS idw
           |FROM agg ORDER BY qid""".stripMargin,

      // target = 2x+5 in (20,80) -> x in (7.5, 37.5); y: 4y-3 in (20,80) -> (5.75, 20.75)
      "q11_bbox_points_scale" ->
        s"""SELECT * FROM ($pts)
           |WHERE x > 7.5 AND x < 37.5 AND y > 5.75 AND y < 20.75
           |ORDER BY l_orderkey, l_linenumber""".stripMargin,
      // projected: (0*x + -1*y + 2) in (-38,-8); (1*x + 0*y + 0) in (10,40)
      "q12_bbox_points_affine" ->
        s"""SELECT * FROM ($pts)
           |WHERE (0.0*x + -1.0*y + 2.0) > -38.0 AND (0.0*x + -1.0*y + 2.0) < -8.0
           |  AND (1.0*x + 0.0*y + 0.0) > 10.0 AND (1.0*x + 0.0*y + 0.0) < 40.0
           |ORDER BY l_orderkey, l_linenumber""".stripMargin,
      "q13_polygon_query_points" ->
        s"""SELECT * FROM ($pts)
           |WHERE x >= 9.97 AND x <= 40.03 AND y >= 9.93 AND y <= 40.41
           |  AND ${halfPlaneSql(tri)}
           |ORDER BY l_orderkey, l_linenumber""".stripMargin,
      // regular 64-gon: area = (n/2) r^2 sin(2*pi/n); centroid = center
      "q14_circle_ngon_stats" ->
        s"""SELECT index, ROUND(32.0 * radius * radius * SIN(2.0 * PI() / 64.0), 6) AS area,
           |  ROUND(cx, 6) AS ctr_x, ROUND(cy, 6) AS ctr_y
           |FROM ($circlesSql) ORDER BY index""".stripMargin,
      "q15_extent_circles" ->
        s"""SELECT min(cx - radius) AS xmin, min(cy - radius) AS ymin,
           |  max(cx + radius) AS xmax, max(cy + radius) AS ymax
           |FROM ($circlesSql)""".stripMargin,
      "q16_labels_bbox" ->
        """SELECT * FROM (
          |  SELECT CAST(event_id % 128 AS INT) AS y, CAST(user_id % 128 AS INT) AS x,
          |         event_id % 7 + 1 AS label FROM events)
          |WHERE y >= 10 AND y <= 91 AND x >= 0 AND x <= 101
          |ORDER BY y, x, label""".stripMargin,
      "q17_bbox_filter_table" ->
        s"""SELECT o_orderkey, o_totalprice FROM orders
           |WHERE o_orderkey IN (
           |  SELECT l_orderkey FROM ($pts)
           |  WHERE x > 10.0 AND x < 15.0 AND y > 10.0 AND y < 20.0)
           |ORDER BY o_orderkey""".stripMargin
    )
  }
}
