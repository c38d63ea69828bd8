package graft.ops

import graft.geom.{GMultiPolygon, GPolygon, WKB}
import graft.geom.st._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raster/shape -> shape conversions (`_core/operations/vectorize.py`).
  *
  * 2D ONLY, by the reference's own contract: `to_polygons`/`to_circles`
  * raise for 3D rasters (vectorize.py walks (y, x) contours and shapes
  * are a 2D GeoDataFrame model), and this engine pins the SAME loud
  * refusal ([[require2d]]) rather than silently flattening a z-stack —
  * even though 3D labels now flow end-to-end elsewhere (q358/q359
  * components, q362-q364 rasterize/resample/pyramid).
  */
object Vectorize {

  private def require2d(labels: DataFrame, op: String): Unit =
    require(!labels.columns.contains("z"),
      s"$op: labels have a z axis — vectorize is 2D-only (the reference's " +
        "vectorize.py raises for 3D rasters; shapes are a 2D model). " +
        "Select a z plane or aggregate over z first.")

  /** Labels -> equal-area circles: radius = sqrt(area/pi), center =
    * centroid (vectorize.py:39-156). Pure aggregation; `pixelArea` scales
    * counts to areas.
    */
  def labelsToCircles(labels: DataFrame, pixelArea: Double = 1.0): DataFrame = {
    require2d(labels, "labelsToCircles")
    labels.filter(col("label") =!= 0)
      .groupBy(col("label").as("index"))
      .agg(
        avg(col("x")).as("x"), avg(col("y")).as("y"),
        sqrt(count(lit(1)) * pixelArea / math.Pi).as("radius"))
  }

  /** Polygons -> equal-area circles (vectorize.py:84-117). */
  def shapesToCircles(shapes: DataFrame): DataFrame =
    shapes.select(col("index"),
      st_centroid_x(col("geometry")).as("x"),
      st_centroid_y(col("geometry")).as("y"),
      when(col("geom_type") === "circle", col("radius"))
        .otherwise(sqrt(st_area(col("geometry")) / math.Pi)).as("radius"))

  /** Circles -> n-gon polygons (vectorize.py:273-293). */
  def circlesToPolygons(shapes: DataFrame, quadSegs: Int = 16): DataFrame =
    shapes.withColumn("geometry",
      when(col("geom_type") === "circle",
        st_buffer_point(st_centroid_x(col("geometry")), st_centroid_y(col("geometry")),
          col("radius"), lit(quadSegs)))
        .otherwise(col("geometry")))
      .withColumn("geom_type",
        when(col("geom_type") === "circle", lit("polygon")).otherwise(col("geom_type")))

  /** Labels -> boundary polygons (vectorize.py:160-302, re-architected):
    *
    * 1. Distributed boundary-edge detection: a pixel contributes a directed
    *    unit edge for each of its 4 sides whose neighbor has a different
    *    label (left joins on shifted coordinates — shuffle joins, any scale).
    *    Interior is kept on the left of the edge direction, so exterior
    *    rings come out CCW and holes CW.
    * 2. Per-label ring assembly in `mapGroups`: a label's boundary is tiny
    *    compared to its pixel count; chaining edges into rings is
    *    driver-free, per-group work — the analog of the reference's
    *    per-chunk `find_contours` + cross-chunk dissolve.
    *
    * Exact pixel-square boundaries (the reference's marching squares also
    * traces pixel edges at 0.5 offsets); total polygon area == pixel count.
    */
  def labelsToPolygons(labels: DataFrame): DataFrame = {
    require2d(labels, "labelsToPolygons")
    val spark = labels.sparkSession
    import spark.implicits._
    val px = labels.filter(col("label") =!= 0)
      .select(col("y").cast("int"), col("x").cast("int"), col("label").cast("long"))

    val p = px.as("p")
    // "pixel q exists at (p.y+dy, p.x+dx)" <=> q.y - dy == p.y
    def neighbor(dy: Int, dx: Int) = px.as("n")
      .select((col("y") - lit(dy)).as("ny"), (col("x") - lit(dx)).as("nx"),
        col("label").as("nlabel"))

    // one directed edge per exposed side; interior on the left
    def sideEdges(dy: Int, dx: Int, mk: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => Seq[org.apache.spark.sql.Column]) =
      p.join(neighbor(dy, dx),
          col("p.y") === col("ny") && col("p.x") === col("nx") &&
            col("p.label") === col("nlabel"), "left_anti")
        .select(col("p.label").as("label"),
          struct(mk(col("p.x"), col("p.y")): _*).as("e"))

    // neighbor at (y-1): bottom side exposed -> edge (x,y) -> (x+1,y)
    val bottom = sideEdges(-1, 0, (x, y) => Seq(x.as("sx"), y.as("sy"), (x + 1).as("ex"), y.as("ey")))
    // neighbor at (x+1): right side -> (x+1,y) -> (x+1,y+1)
    val right = sideEdges(0, 1, (x, y) => Seq((x + 1).as("sx"), y.as("sy"), (x + 1).as("ex"), (y + 1).as("ey")))
    // neighbor at (y+1): top side -> (x+1,y+1) -> (x,y+1)
    val top = sideEdges(1, 0, (x, y) => Seq((x + 1).as("sx"), (y + 1).as("sy"), x.as("ex"), (y + 1).as("ey")))
    // neighbor at (x-1): left side -> (x,y+1) -> (x,y)
    val left = sideEdges(0, -1, (x, y) => Seq(x.as("sx"), (y + 1).as("sy"), x.as("ex"), y.as("ey")))

    val edges = bottom.unionByName(right).unionByName(top).unionByName(left)

    edges.select(col("label"), col("e.sx"), col("e.sy"), col("e.ex"), col("e.ey"))
      .as[(Long, Int, Int, Int, Int)]
      .groupByKey(_._1)
      .mapGroups { (label, it) =>
        val rings = chainRings(it.map(t => (t._2, t._3, t._4, t._5)).toArray)
        // CCW rings (positive shoelace) are exteriors, CW are holes; attach
        // each hole to the exterior that contains it.
        val (exts, holes) = rings.partition(signedArea(_) > 0)
        val polys = exts.map(e => scala.collection.mutable.ArrayBuffer(e))
        holes.foreach { h =>
          val idx = exts.indexWhere(e => ringContainsPoint(e, h(0) + 0.5, h(1)))
          polys(if (idx >= 0) idx else 0) += h
        }
        val geom =
          if (polys.length == 1) WKB.write(GPolygon(polys(0).toArray))
          else WKB.write(GMultiPolygon(polys.map(rs => GPolygon(rs.toArray)).toArray))
        (label, geom, if (polys.length == 1) "polygon" else "multipolygon")
      }
      .toDF("index", "geometry", "geom_type")
  }

  /** Chain directed unit edges into closed rings; at 4-valent corner
    * vertices (diagonally touching pixels) prefer the leftmost turn so
    * rings stay simple. Collinear runs are merged.
    */
  private def chainRings(edges: Array[(Int, Int, Int, Int)]): Array[Array[Double]] = {
    import scala.collection.mutable
    val out = mutable.Map.empty[(Int, Int), mutable.ListBuffer[(Int, Int)]]
    edges.foreach { case (sx, sy, ex, ey) =>
      out.getOrElseUpdate((sx, sy), mutable.ListBuffer.empty) += ((ex, ey))
    }
    val rings = mutable.ArrayBuffer.empty[Array[Double]]
    while (out.nonEmpty) {
      val (start, _) = out.head
      val ring = mutable.ArrayBuffer.empty[(Int, Int)]
      var cur = start
      var prev: (Int, Int) = null
      var guard = 0
      do {
        ring += cur
        val nexts = out(cur)
        val nxt =
          if (nexts.size == 1 || prev == null) nexts.head
          else {
            // leftmost turn relative to incoming direction
            val (dx, dy) = (cur._1 - prev._1, cur._2 - prev._2)
            nexts.maxBy { case (ex, ey) =>
              val (nx2, ny2) = (ex - cur._1, ey - cur._2)
              math.atan2(dx * ny2 - dy * nx2, dx * nx2 + dy * ny2)
            }
          }
        nexts -= nxt
        if (nexts.isEmpty) out.remove(cur)
        prev = cur
        cur = nxt
        guard += 1
        require(guard <= edges.length + 1, "ring chaining did not terminate")
      } while (cur != start)
      rings += simplify(ring.toArray)
    }
    rings.toArray
  }

  private def simplify(ring: Array[(Int, Int)]): Array[Double] = {
    val n = ring.length
    val keep = (0 until n).filter { i =>
      val a = ring((i - 1 + n) % n); val b = ring(i); val c = ring((i + 1) % n)
      (b._1 - a._1) * (c._2 - b._2) - (b._2 - a._2) * (c._1 - b._1) != 0
    }
    val pts = if (keep.isEmpty) (0 until n) else keep
    pts.flatMap(i => Seq(ring(i)._1.toDouble, ring(i)._2.toDouble)).toArray
  }

  private def signedArea(ring: Array[Double]): Double = {
    var a = 0.0
    val n = ring.length / 2
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      a += ring(2 * i) * ring(2 * j + 1) - ring(2 * j) * ring(2 * i + 1)
      i += 1
    }
    a / 2.0
  }

  private def ringContainsPoint(ring: Array[Double], x: Double, y: Double): Boolean = {
    var inside = false
    val n = ring.length / 2
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val xi = ring(2 * i); val yi = ring(2 * i + 1)
      val xj = ring(2 * j); val yj = ring(2 * j + 1)
      if ((yi > y) != (yj > y) && x < xi + (y - yi) * (xj - xi) / (yj - yi)) inside = !inside
      i += 1
    }
    inside
  }
}
