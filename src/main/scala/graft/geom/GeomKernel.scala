package graft.geom

/** Executor-side computational-geometry kernel.
  *
  * Every method is a static-forwarder-friendly function over primitive args /
  * WKB byte arrays so Catalyst can call it from generated code via
  * `StaticInvoke` (see [[graft.geom.st]]). Implements exactly the predicates
  * and measures the reference uses through shapely/GEOS: area, centroid,
  * point-in-polygon, intersects, affine transform, n-gon buffer, convex clip
  * (reference usages: spatial_query.py:746-975, aggregate.py:312-493,
  * vectorize.py:39-302, transform.py:506-547).
  */
object GeomKernel {

  // ---- envelope ----

  def envelopeMinX(wkb: Array[Byte]): Double = WKB.read(wkb).envelope(0)
  def envelopeMinY(wkb: Array[Byte]): Double = WKB.read(wkb).envelope(1)
  def envelopeMaxX(wkb: Array[Byte]): Double = WKB.read(wkb).envelope(2)
  def envelopeMaxY(wkb: Array[Byte]): Double = WKB.read(wkb).envelope(3)

  // ---- measures ----

  /** Signed shoelace area of one ring (positive = CCW). */
  private def ringSignedArea(ring: Array[Double]): Double = {
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

  private def polygonArea(p: GPolygon): Double = {
    // Exterior minus holes, orientation-independent (abs per ring).
    var a = math.abs(ringSignedArea(p.rings(0)))
    var r = 1
    while (r < p.rings.length) {
      a -= math.abs(ringSignedArea(p.rings(r)))
      r += 1
    }
    a
  }

  def area(wkb: Array[Byte]): Double = WKB.read(wkb) match {
    case _: GPoint => 0.0
    case p: GPolygon => polygonArea(p)
    case GMultiPolygon(ps) => ps.map(polygonArea).sum
  }

  private def ringCentroid(ring: Array[Double]): (Double, Double, Double) = {
    // (cx*A, cy*A, A) with signed A — standard polygon centroid accumulation.
    var cx = 0.0; var cy = 0.0; var a = 0.0
    val n = ring.length / 2
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val cross = ring(2 * i) * ring(2 * j + 1) - ring(2 * j) * ring(2 * i + 1)
      cx += (ring(2 * i) + ring(2 * j)) * cross
      cy += (ring(2 * i + 1) + ring(2 * j + 1)) * cross
      a += cross
      i += 1
    }
    (cx / 6.0, cy / 6.0, a / 2.0)
  }

  private def polygonCentroid(p: GPolygon): (Double, Double, Double) = {
    // Exterior contributes +|A|, holes -|A| (orientation-normalized).
    var cx = 0.0; var cy = 0.0; var ar = 0.0
    var r = 0
    while (r < p.rings.length) {
      val (x, y, a) = ringCentroid(p.rings(r))
      val sign = if (r == 0) 1.0 else -1.0
      val s = if (a == 0.0) 0.0 else sign * math.signum(a)
      cx += x * s; cy += y * s; ar += math.abs(a) * sign
      r += 1
    }
    (cx, cy, ar)
  }

  def centroidX(wkb: Array[Byte]): Double = WKB.read(wkb) match {
    case GPoint(x, _) => x
    case p: GPolygon => val (cx, _, a) = polygonCentroid(p); cx / a
    case GMultiPolygon(ps) =>
      val parts = ps.map(polygonCentroid)
      parts.map(_._1).sum / parts.map(_._3).sum
  }

  def centroidY(wkb: Array[Byte]): Double = WKB.read(wkb) match {
    case GPoint(_, y) => y
    case p: GPolygon => val (_, cy, a) = polygonCentroid(p); cy / a
    case GMultiPolygon(ps) =>
      val parts = ps.map(polygonCentroid)
      parts.map(_._2).sum / parts.map(_._3).sum
  }

  // ---- predicates ----

  private def ringContains(ring: Array[Double], x: Double, y: Double): Boolean = {
    // Even-odd ray casting; points exactly on an edge count as inside
    // via the on-segment check (matches shapely `intersects` semantics
    // closely enough for the reference's sjoin usage).
    var inside = false
    val n = ring.length / 2
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val xi = ring(2 * i); val yi = ring(2 * i + 1)
      val xj = ring(2 * j); val yj = ring(2 * j + 1)
      // on-segment check
      val cross = (x - xi) * (yj - yi) - (y - yi) * (xj - xi)
      if (cross == 0.0 &&
          x >= math.min(xi, xj) && x <= math.max(xi, xj) &&
          y >= math.min(yi, yj) && y <= math.max(yi, yj)) return true
      if ((yi > y) != (yj > y)) {
        val xint = xi + (y - yi) * (xj - xi) / (yj - yi)
        if (x < xint) inside = !inside
      }
      i += 1
    }
    inside
  }

  private def polygonContains(p: GPolygon, x: Double, y: Double): Boolean = {
    if (!ringContains(p.rings(0), x, y)) return false
    var r = 1
    while (r < p.rings.length) {
      if (ringContains(p.rings(r), x, y)) {
        // Inside a hole: only "contained" if exactly on the hole boundary.
        return onRingBoundary(p.rings(r), x, y)
      }
      r += 1
    }
    true
  }

  private def onRingBoundary(ring: Array[Double], x: Double, y: Double): Boolean = {
    val n = ring.length / 2
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val xi = ring(2 * i); val yi = ring(2 * i + 1)
      val xj = ring(2 * j); val yj = ring(2 * j + 1)
      val cross = (x - xi) * (yj - yi) - (y - yi) * (xj - xi)
      if (cross == 0.0 &&
          x >= math.min(xi, xj) && x <= math.max(xi, xj) &&
          y >= math.min(yi, yj) && y <= math.max(yi, yj)) return true
      i += 1
    }
    false
  }

  /** Point-in-geometry (polygon/multipolygon; point = equality). */
  def containsPoint(wkb: Array[Byte], x: Double, y: Double): Boolean =
    WKB.read(wkb) match {
      case GPoint(px, py) => px == x && py == y
      case p: GPolygon => polygonContains(p, x, y)
      case GMultiPolygon(ps) => ps.exists(polygonContains(_, x, y))
    }

  private def segmentsIntersect(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    def orient(px: Double, py: Double, qx: Double, qy: Double, rx: Double, ry: Double): Double =
      (qx - px) * (ry - py) - (qy - py) * (rx - px)
    def onSeg(px: Double, py: Double, qx: Double, qy: Double, rx: Double, ry: Double): Boolean =
      rx >= math.min(px, qx) && rx <= math.max(px, qx) &&
        ry >= math.min(py, qy) && ry <= math.max(py, qy)
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    if (((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) &&
        ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0))) return true
    if (o1 == 0 && onSeg(ax, ay, bx, by, cx, cy)) return true
    if (o2 == 0 && onSeg(ax, ay, bx, by, dx, dy)) return true
    if (o3 == 0 && onSeg(cx, cy, dx, dy, ax, ay)) return true
    if (o4 == 0 && onSeg(cx, cy, dx, dy, bx, by)) return true
    false
  }

  private def ringsIntersect(a: Array[Double], b: Array[Double]): Boolean = {
    val na = a.length / 2; val nb = b.length / 2
    var i = 0
    while (i < na) {
      val i2 = (i + 1) % na
      var j = 0
      while (j < nb) {
        val j2 = (j + 1) % nb
        if (segmentsIntersect(
          a(2 * i), a(2 * i + 1), a(2 * i2), a(2 * i2 + 1),
          b(2 * j), b(2 * j + 1), b(2 * j2), b(2 * j2 + 1))) return true
        j += 1
      }
      i += 1
    }
    false
  }

  private def polysIntersect(a: GPolygon, b: GPolygon): Boolean = {
    val ea = a.envelope; val eb = b.envelope
    if (ea(0) > eb(2) || eb(0) > ea(2) || ea(1) > eb(3) || eb(1) > ea(3)) return false
    // vertex containment either way, else boundary crossing
    if (polygonContains(a, b.rings(0)(0), b.rings(0)(1))) return true
    if (polygonContains(b, a.rings(0)(0), a.rings(0)(1))) return true
    var i = 0
    while (i < a.rings.length) {
      var j = 0
      while (j < b.rings.length) {
        if (ringsIntersect(a.rings(i), b.rings(j))) return true
        j += 1
      }
      i += 1
    }
    false
  }

  /** Geometry-geometry intersects over WKB (polygon/multipolygon/point). */
  def intersects(wkbA: Array[Byte], wkbB: Array[Byte]): Boolean = {
    (WKB.read(wkbA), WKB.read(wkbB)) match {
      case (GPoint(x, y), g) => containsGeomPoint(g, x, y)
      case (g, GPoint(x, y)) => containsGeomPoint(g, x, y)
      case (a: GPolygon, b: GPolygon) => polysIntersect(a, b)
      case (a: GPolygon, GMultiPolygon(bs)) => bs.exists(polysIntersect(a, _))
      case (GMultiPolygon(as), b: GPolygon) => as.exists(polysIntersect(_, b))
      case (GMultiPolygon(as), GMultiPolygon(bs)) =>
        as.exists(a => bs.exists(polysIntersect(a, _)))
    }
  }

  private def containsGeomPoint(g: Geom, x: Double, y: Double): Boolean = g match {
    case GPoint(px, py) => px == x && py == y
    case p: GPolygon => polygonContains(p, x, y)
    case GMultiPolygon(ps) => ps.exists(polygonContains(_, x, y))
  }

  /** Geometry intersects an axis-aligned box (used by bounding_box_query on
    * shapes after the coarse bbox-column prefilter, spatial_query.py:746-800).
    */
  def intersectsBox(wkb: Array[Byte], minx: Double, miny: Double,
      maxx: Double, maxy: Double): Boolean = {
    val boxRing = Array(minx, miny, maxx, miny, maxx, maxy, minx, maxy)
    WKB.read(wkb) match {
      case GPoint(x, y) => x >= minx && x <= maxx && y >= miny && y <= maxy
      case p: GPolygon => polysIntersect(p, GPolygon(Array(boxRing)))
      case GMultiPolygon(ps) => ps.exists(polysIntersect(_, GPolygon(Array(boxRing))))
    }
  }

  // ---- constructions ----

  /** Affine-map every coordinate in the WKB stream: (x,y) -> (m00 x + m01 y
    * + t0, m10 x + m11 y + t1) (reference transform.py:506-547).
    */
  def affine(wkb: Array[Byte], m00: Double, m01: Double, t0: Double,
      m10: Double, m11: Double, t1: Double): Array[Byte] = {
    def tx(x: Double, y: Double) = m00 * x + m01 * y + t0
    def ty(x: Double, y: Double) = m10 * x + m11 * y + t1
    def mapRing(r: Array[Double]): Array[Double] = {
      val out = new Array[Double](r.length)
      var i = 0
      while (i < r.length) {
        out(i) = tx(r(i), r(i + 1)); out(i + 1) = ty(r(i), r(i + 1))
        i += 2
      }
      out
    }
    val g = WKB.read(wkb) match {
      case GPoint(x, y) => GPoint(tx(x, y), ty(x, y))
      case GPolygon(rings) => GPolygon(rings.map(mapRing))
      case GMultiPolygon(ps) => GMultiPolygon(ps.map(p => GPolygon(p.rings.map(mapRing))))
    }
    WKB.write(g)
  }

  /** Point WKB constructor. */
  def makePoint(x: Double, y: Double): Array[Byte] = WKB.write(GPoint(x, y))

  /** Axis-aligned box polygon constructor (CCW). */
  def makeBox(minx: Double, miny: Double, maxx: Double, maxy: Double): Array[Byte] =
    WKB.write(GPolygon(Array(Array(minx, miny, maxx, miny, maxx, maxy, minx, maxy))))

  /** Circle -> n-gon polygon (`to_polygons` on circles buffers by radius,
    * vectorize.py:273-293; quadSegs segments per quarter circle like GEOS).
    */
  def bufferPoint(x: Double, y: Double, radius: Double, quadSegs: Int): Array[Byte] = {
    val n = math.max(4, quadSegs * 4)
    val ring = new Array[Double](n * 2)
    var i = 0
    while (i < n) {
      val theta = 2.0 * math.Pi * i / n
      ring(2 * i) = x + radius * math.cos(theta)
      ring(2 * i + 1) = y + radius * math.sin(theta)
      i += 1
    }
    WKB.write(GPolygon(Array(ring)))
  }

  // ---- rasterization support ----

  /** Scanline fill: packed (y << 32 | x) ids of grid cells whose CENTER lies
    * inside the geometry, on the grid cell (px,py) -> world
    * (x0 + px*sx .. +sx, y0 + py*sy .. +sy), clipped to [0,w) x [0,h)
    * (datashader Canvas.polygons semantics, reference rasterize.py:616-743).
    * Returns Catalyst ArrayData so `st_cover_cells` can explode it in-plan.
    */
  def coverCells(wkb: Array[Byte], x0: Double, y0: Double, sx: Double,
      sy: Double, width: Int, height: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    def fillPolygon(p: GPolygon): Unit = {
      val env = p.envelope
      val pyMin = math.max(0, math.floor((env(1) - y0) / sy).toInt)
      val pyMax = math.min(height - 1, math.ceil((env(3) - y0) / sy).toInt)
      var py = pyMin
      while (py <= pyMax) {
        val yc = y0 + (py + 0.5) * sy
        // x-intersections of all ring edges with the scanline (even-odd)
        val xs = new scala.collection.mutable.ArrayBuffer[Double]()
        p.rings.foreach { ring =>
          val n = ring.length / 2
          var i = 0
          while (i < n) {
            val j = (i + 1) % n
            val y1 = ring(2 * i + 1); val y2 = ring(2 * j + 1)
            if ((y1 > yc) != (y2 > yc)) {
              val x1 = ring(2 * i); val x2 = ring(2 * j)
              xs += x1 + (yc - y1) * (x2 - x1) / (y2 - y1)
            }
            i += 1
          }
        }
        val sorted = xs.sorted
        var k = 0
        while (k + 1 < sorted.length) {
          val pxMin = math.max(0, math.ceil((sorted(k) - x0) / sx - 0.5).toInt)
          val pxMax = math.min(width - 1, math.floor((sorted(k + 1) - x0) / sx - 0.5).toInt)
          var px = pxMin
          while (px <= pxMax) {
            out += (py.toLong << 32) | px.toLong
            px += 1
          }
          k += 2
        }
        py += 1
      }
    }
    WKB.read(wkb) match {
      case GPoint(x, y) =>
        val px = math.floor((x - x0) / sx).toInt
        val py = math.floor((y - y0) / sy).toInt
        if (px >= 0 && px < width && py >= 0 && py < height)
          out += (py.toLong << 32) | px.toLong
      case p: GPolygon => fillPolygon(p)
      case GMultiPolygon(ps) =>
        ps.foreach(fillPolygon)
        // de-dup cells covered by several members
        val distinct = out.distinct
        out.clear(); out ++= distinct
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  // ---- clipping (Sutherland–Hodgman; clip polygon must be convex) ----

  private def clipRingByConvex(subject: Array[Double], clip: Array[Double]): Array[Double] = {
    // Ensure CCW clip ring so "inside" is a consistent half-plane side.
    val c = if (ringSignedArea(clip) < 0) {
      val n = clip.length / 2
      val rev = new Array[Double](clip.length)
      var i = 0
      while (i < n) {
        rev(2 * i) = clip(2 * (n - 1 - i)); rev(2 * i + 1) = clip(2 * (n - 1 - i) + 1)
        i += 1
      }
      rev
    } else clip
    var poly = subject
    val nc = c.length / 2
    var e = 0
    while (e < nc && poly.length >= 6) {
      val e2 = (e + 1) % nc
      val ax = c(2 * e); val ay = c(2 * e + 1)
      val bx = c(2 * e2); val by = c(2 * e2 + 1)
      val np = poly.length / 2
      val out = new scala.collection.mutable.ArrayBuffer[Double](poly.length + 4)
      var i = 0
      while (i < np) {
        val j = (i + 1) % np
        val x1 = poly(2 * i); val y1 = poly(2 * i + 1)
        val x2 = poly(2 * j); val y2 = poly(2 * j + 1)
        val f1 = (bx - ax) * (y1 - ay) - (by - ay) * (x1 - ax)
        val f2 = (bx - ax) * (y2 - ay) - (by - ay) * (x2 - ax)
        val in1 = f1 >= 0; val in2 = f2 >= 0
        if (in1) { out += x1; out += y1 }
        if (in1 != in2 && f1 != f2) {
          val t = f1 / (f1 - f2)
          out += x1 + t * (x2 - x1); out += y1 + t * (y2 - y1)
        }
        i += 1
      }
      poly = out.toArray
      e += 1
    }
    if (poly.length >= 6) poly else Array.emptyDoubleArray
  }

  /** True iff a ring (closed or open form) is convex; collinear runs are
    * allowed. Sutherland-Hodgman clipping is only correct for convex clip
    * rings — callers must validate before clipping (the reference errors on
    * unsupported query geometry, spatial_query.py:297-321).
    */
  def isConvexRing(ring: Array[Double]): Boolean = {
    var n = ring.length / 2
    if (n >= 2 && ring(0) == ring(2 * (n - 1)) && ring(1) == ring(2 * (n - 1) + 1)) n -= 1
    if (n < 3) return false
    var sign = 0.0
    var i = 0
    while (i < n) {
      val a = i; val b = (i + 1) % n; val c = (i + 2) % n
      val cr = (ring(2 * b) - ring(2 * a)) * (ring(2 * c + 1) - ring(2 * a + 1)) -
        (ring(2 * c) - ring(2 * a)) * (ring(2 * b + 1) - ring(2 * a + 1))
      if (cr != 0.0) {
        if (sign == 0.0) sign = math.signum(cr)
        else if (math.signum(cr) != sign) return false
      }
      i += 1
    }
    true
  }

  /** Clip a polygon/multipolygon by a CONVEX polygon; returns WKB or null if
    * the intersection is empty (polygon_query(clip=True),
    * spatial_query.py:958-963). Subject interior rings are clipped too and
    * kept as holes (they stay inside the clipped exterior because the clip
    * is convex). Callers validate clip convexity — see [[isConvexRing]].
    */
  def clipByConvex(wkb: Array[Byte], clipWkb: Array[Byte]): Array[Byte] = {
    val clipG = WKB.read(clipWkb) match {
      case p: GPolygon => p.rings(0)
      case _ => sys.error("clip geometry must be a polygon")
    }
    def clipPoly(p: GPolygon): Option[GPolygon] = {
      val ext = clipRingByConvex(p.rings(0), clipG)
      // a boundary-touching subject clips to a degenerate zero-area ring —
      // that is an empty polygon intersection, not a clipped polygon
      if (ext.isEmpty || ringSignedArea(ext) == 0.0) None
      else {
        val holes = p.rings.iterator.drop(1)
          .map(h => clipRingByConvex(h, clipG)).filter(_.nonEmpty).toArray
        Some(GPolygon(Array(ext) ++ holes))
      }
    }
    WKB.read(wkb) match {
      case p: GPolygon =>
        clipPoly(p).map(out => WKB.write(out)).orNull
      case GMultiPolygon(ps) =>
        val rs = ps.flatMap(clipPoly)
        if (rs.isEmpty) null else WKB.write(GMultiPolygon(rs))
      case GPoint(x, y) =>
        if (ringContains(clipG, x, y)) WKB.write(GPoint(x, y)) else null
    }
  }

  /** Area of (geometry ∩ convex polygon) — the `fractions=True` weight
    * (aggregate.py:429-450) without materializing the clipped geometry.
    */
  def intersectionAreaConvex(wkb: Array[Byte], clipWkb: Array[Byte]): Double = {
    val clipped = clipByConvex(wkb, clipWkb)
    if (clipped == null) 0.0 else area(clipped)
  }

  // ---- general (non-convex) intersection area ----
  //
  // The "hard part #1" of SURVEY.md §7.4: the reference leans on GEOS
  // overlay for polygon-polygon intersection. Instead of porting a general
  // clipper, the area (which is all fractions-weighting needs) decomposes
  // exactly: ear-triangulate one ring (triangles are convex), clip the
  // other ring by each triangle with the existing Sutherland-Hodgman
  // kernel, and sum. Holes enter by inclusion-exclusion:
  //   area(P ∩ Q) = A(Pe∩Qe) - Σ A(Pe∩Qh) - Σ A(Ph∩Qe) + ΣΣ A(Ph∩Qh)
  // (holes lie inside their exterior and are mutually disjoint).

  /** Ear-clipping triangulation of a simple ring. Returns triangles as
    * flat [x0,y0,x1,y1,x2,y2] arrays. Collinear vertices are dropped
    * up-front; if numeric degeneracy ever blocks every ear, the remaining
    * fan is emitted (zero-area slivers contribute nothing to area sums).
    */
  private[geom] def earTriangulate(ring0: Array[Double]): Array[Array[Double]] = {
    // strip duplicate closing vertex and collinear points; force CCW
    var ring = ring0
    if (ring.length >= 4 && ring(0) == ring(ring.length - 2) &&
      ring(1) == ring(ring.length - 1)) ring = ring.dropRight(2)
    if (ringSignedArea(ring) < 0) {
      val n = ring.length / 2
      val rev = new Array[Double](ring.length)
      var i = 0
      while (i < n) {
        rev(2 * i) = ring(2 * (n - 1 - i)); rev(2 * i + 1) = ring(2 * (n - 1 - i) + 1)
        i += 1
      }
      ring = rev
    }
    val xs = scala.collection.mutable.ArrayBuffer[Double]()
    val ys = scala.collection.mutable.ArrayBuffer[Double]()
    val n0 = ring.length / 2
    var k = 0
    while (k < n0) {
      val p = (k + n0 - 1) % n0; val q = (k + 1) % n0
      val cross = (ring(2 * k) - ring(2 * p)) * (ring(2 * q + 1) - ring(2 * p + 1)) -
        (ring(2 * q) - ring(2 * p)) * (ring(2 * k + 1) - ring(2 * p + 1))
      if (cross != 0.0) { xs += ring(2 * k); ys += ring(2 * k + 1) }
      k += 1
    }
    if (xs.length < 3) return Array.empty
    val idx = scala.collection.mutable.ArrayBuffer.tabulate(xs.length)(identity)
    val out = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    def cross3(a: Int, b: Int, c: Int): Double =
      (xs(b) - xs(a)) * (ys(c) - ys(a)) - (xs(c) - xs(a)) * (ys(b) - ys(a))
    def inTriangle(a: Int, b: Int, c: Int, p: Int): Boolean = {
      // non-strict: a vertex ON the candidate triangle's boundary blocks
      // the ear too — a diagonal through a reflex vertex would make the
      // next cut overlap (double-counted area)
      val d1 = cross3(a, b, p); val d2 = cross3(b, c, p); val d3 = cross3(c, a, p)
      (d1 >= 0 && d2 >= 0 && d3 >= 0) || (d1 <= 0 && d2 <= 0 && d3 <= 0)
    }
    var guard = idx.length * idx.length + 16
    while (idx.length > 3 && guard > 0) {
      guard -= 1
      var ear = -1
      var i = 0
      while (i < idx.length && ear < 0) {
        val a = idx((i + idx.length - 1) % idx.length)
        val b = idx(i)
        val c = idx((i + 1) % idx.length)
        if (cross3(a, b, c) > 0 &&
          !idx.exists(p => p != a && p != b && p != c && inTriangle(a, b, c, p)))
          ear = i
        i += 1
      }
      if (ear < 0) {
        // numeric degeneracy: fan out the rest (slivers are zero-area)
        var j = 1
        while (j + 1 < idx.length) {
          out += Array(xs(idx(0)), ys(idx(0)), xs(idx(j)), ys(idx(j)),
            xs(idx(j + 1)), ys(idx(j + 1)))
          j += 1
        }
        return out.toArray
      }
      val a = idx((ear + idx.length - 1) % idx.length)
      val b = idx(ear)
      val c = idx((ear + 1) % idx.length)
      out += Array(xs(a), ys(a), xs(b), ys(b), xs(c), ys(c))
      idx.remove(ear)
    }
    if (idx.length == 3)
      out += Array(xs(idx(0)), ys(idx(0)), xs(idx(1)), ys(idx(1)), xs(idx(2)), ys(idx(2)))
    out.toArray
  }

  /** Parsed geometry + per-ring triangulation memo, shared by the pair
    * kernels through [[cachedGeom]]. Grid-join pair tables repeat the same
    * geometry in many rows (every cell/partner it touches), so parsing the
    * WKB and ear-triangulating its rings per PAIR is pure repeated work —
    * a bounded per-thread LRU turns both into per-distinct-geometry work.
    * Ring keys are identity references, valid exactly because the rings
    * come from the cached parse.
    */
  private final class CachedGeom(val g: Geom) {
    private var tris: java.util.IdentityHashMap[Array[Double], Array[Array[Double]]] = null
    def tri(r: Array[Double]): Array[Array[Double]] = {
      if (tris == null)
        tris = new java.util.IdentityHashMap[Array[Double], Array[Array[Double]]](4)
      var t = tris.get(r)
      if (t == null) { t = earTriangulate(r); tris.put(r, t) }
      t
    }
  }

  private val geomCacheTL =
    new ThreadLocal[java.util.LinkedHashMap[java.nio.ByteBuffer, CachedGeom]] {
      override def initialValue() =
        new java.util.LinkedHashMap[java.nio.ByteBuffer, CachedGeom](256, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[java.nio.ByteBuffer, CachedGeom]): Boolean = size > 192
        }
    }

  private def cachedGeom(wkb: Array[Byte]): CachedGeom = {
    val cache = geomCacheTL.get()
    var c = cache.get(java.nio.ByteBuffer.wrap(wkb)) // content equals/hashCode
    if (c == null) {
      c = new CachedGeom(WKB.read(wkb))
      // own the key bytes: the caller's array may be a reused row buffer
      cache.put(java.nio.ByteBuffer.wrap(wkb.clone()), c)
    }
    c
  }

  /** Area of ringA ∩ ringB for arbitrary simple rings: triangulate the
    * smaller ring, sum convex-clip areas of the other against each
    * triangle (Sutherland-Hodgman with a convex clip is area-exact even
    * for non-convex subjects — degenerate bridges are zero-width).
    */
  private def ringIntersectionArea(ra: Array[Double], ca: CachedGeom,
      rb: Array[Double], cb: CachedGeom): Double = {
    val (tri, subject) =
      if (ra.length <= rb.length) (ca.tri(ra), rb) else (cb.tri(rb), ra)
    var a = 0.0
    var i = 0
    while (i < tri.length) {
      val clipped = clipRingByConvex(subject, tri(i))
      if (clipped.nonEmpty) a += math.abs(ringSignedArea(clipped))
      i += 1
    }
    a
  }

  private def ringsWithSigns(g: Geom): Seq[(Array[Double], Double)] = g match {
    case p: GPolygon =>
      p.rings.zipWithIndex.map { case (r, i) => (r, if (i == 0) 1.0 else -1.0) }.toSeq
    case GMultiPolygon(ps) => ps.toSeq.flatMap(ringsWithSigns)
    case _: GPoint => Seq.empty
  }

  /** Area of (A ∩ B) for arbitrary simple polygons / multipolygons with
    * holes — the general `fractions=True` weight (no convexity
    * assumption). Envelope-disjoint pairs short-circuit to 0.
    */
  def intersectionArea(wkbA: Array[Byte], wkbB: Array[Byte]): Double = {
    val ca = cachedGeom(wkbA); val cb = cachedGeom(wkbB)
    val a = ca.g; val b = cb.g
    val ea = a.envelope; val eb = b.envelope
    if (ea(2) < eb(0) || eb(2) < ea(0) || ea(3) < eb(1) || eb(3) < ea(1)) return 0.0
    var total = 0.0
    ringsWithSigns(a).foreach { case (ra, sa) =>
      ringsWithSigns(b).foreach { case (rb, sb) =>
        if (sa * sb != 0.0) {
          val area = ringIntersectionArea(ra, ca, rb, cb)
          if (area != 0.0) total += sa * sb * area
        }
      }
    }
    math.max(total, 0.0)
  }

  /** Partition a simple polygon WITH HOLES into convex, hole-free
    * trapezoids: vertical slabs between consecutive distinct vertex
    * x-coordinates (exterior + holes); within a slab every non-vertical
    * edge either spans it fully or misses it (all vertices sit on slab
    * boundaries), so sorting the spanning edges by y and pairing them
    * even-odd yields the interior bands — each a convex quad (or
    * triangle) between two edges. Exact scanline-fill reasoning: for a
    * valid polygon (simple rings, holes inside and disjoint) the interior
    * at any x is the odd bands between edge crossings. Hole interiors
    * fall BETWEEN pairs and are excluded by construction.
    */
  private[geom] def trapezoidDecompose(rings: Array[Array[Double]]): Array[Array[Double]] = {
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double, Double)]
    val cuts = scala.collection.mutable.SortedSet.empty[Double]
    rings.foreach { r =>
      var n = r.length / 2
      if (n >= 2 && r(0) == r(2 * (n - 1)) && r(1) == r(2 * (n - 1) + 1)) n -= 1
      var i = 0
      while (i < n) {
        val j = (i + 1) % n
        val (x1, y1, x2, y2) = (r(2 * i), r(2 * i + 1), r(2 * j), r(2 * j + 1))
        cuts += x1
        if (x1 != x2) edges += ((x1, y1, x2, y2))
        i += 1
      }
    }
    val xs = cuts.toArray
    def yAt(e: (Double, Double, Double, Double), x: Double): Double =
      if (x == e._1) e._2 else if (x == e._3) e._4
      else e._2 + (e._4 - e._2) * ((x - e._1) / (e._3 - e._1))
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var s = 0
    while (s + 1 < xs.length) {
      val xl = xs(s); val xr = xs(s + 1); val xm = (xl + xr) / 2
      val span = edges.filter(e =>
        math.min(e._1, e._3) <= xl && math.max(e._1, e._3) >= xr)
      val sorted = span.sortBy(e => yAt(e, xm)).toArray
      require(sorted.length % 2 == 0,
        s"trapezoidDecompose: odd edge parity in slab [$xl, $xr] — invalid polygon")
      var k = 0
      while (k + 1 < sorted.length) {
        val lo = sorted(k); val hi = sorted(k + 1)
        val ring = Array(
          xl, yAt(lo, xl), xr, yAt(lo, xr), xr, yAt(hi, xr), xl, yAt(hi, xl))
        if (math.abs(ringSignedArea(ring)) > 0.0) out += ring
        k += 2
      }
      s += 1
    }
    out.toArray
  }

  /** Clip a geometry by an ARBITRARY simple polygon — reflex vertices and
    * interior rings (holes) allowed. The clip polygon decomposes into
    * convex pieces (ear triangles for a hole-free ring,
    * [[trapezoidDecompose]] bands when it has holes); the subject clips
    * against each piece with the existing Sutherland-Hodgman kernel;
    * non-empty pieces concatenate into a multipolygon PARTITION of the
    * true intersection. Seams along decomposition edges are interior
    * edges: area, containment, intersection and rasterization semantics
    * are exact; the representation is a partition rather than a
    * GEOS-style dissolved overlay. Convex clips take the single-pass
    * path unchanged. Returns null when the intersection is empty.
    */
  // polygon_query(clip=True) evaluates clipGeneral with a CONSTANT clip
  // literal across millions of rows — memoize the last clip's parse +
  // decomposition per thread (tasks are single-threaded; byte-equality
  // keyed, so a changing clip column still computes correctly)
  private val lastClipDecomp =
    new ThreadLocal[(Array[Byte], Boolean, Array[Array[Double]])]

  private def clipDecomposition(clipWkb: Array[Byte]): (Boolean, Array[Array[Double]]) = {
    val cached = lastClipDecomp.get()
    if (cached != null && java.util.Arrays.equals(cached._1, clipWkb))
      return (cached._2, cached._3)
    val clipG = WKB.read(clipWkb) match {
      case p: GPolygon => p
      case _ => sys.error("clip geometry must be a polygon")
    }
    val convex = clipG.rings.length == 1 && isConvexRing(clipG.rings(0))
    val pieces =
      if (convex) Array.empty[Array[Double]]
      else if (clipG.rings.length == 1) earTriangulate(clipG.rings(0))
      else trapezoidDecompose(clipG.rings)
    lastClipDecomp.set((clipWkb.clone(), convex, pieces))
    (convex, pieces)
  }

  def clipGeneral(wkb: Array[Byte], clipWkb: Array[Byte]): Array[Byte] = {
    val (convex, tris) = clipDecomposition(clipWkb)
    if (convex) return clipByConvex(wkb, clipWkb)
    WKB.read(wkb) match {
      case GPoint(x, y) =>
        if (tris.exists(t => ringContains(t, x, y))) WKB.write(GPoint(x, y)) else null
      case _ =>
        val pieces = scala.collection.mutable.ArrayBuffer[GPolygon]()
        var i = 0
        while (i < tris.length) {
          if (math.abs(ringSignedArea(tris(i))) > 0.0) {
            val clipped = clipByConvex(wkb, WKB.write(GPolygon(Array(tris(i)))))
            if (clipped != null) WKB.read(clipped) match {
              case p: GPolygon => pieces += p
              case GMultiPolygon(ps) => pieces ++= ps
              case _: GPoint => ()
            }
          }
          i += 1
        }
        if (pieces.isEmpty) null
        else if (pieces.length == 1) WKB.write(pieces.head)
        else WKB.write(GMultiPolygon(pieces.toArray))
    }
  }

  /** Axis-aligned L-shape polygon: the union of [x0, x0+w] x [y0, y0+h1]
    * and [x0, x0+w2] x [y0, y0+h2] with w2 < w, h1 < h2 (a canonical
    * non-convex test/fixture shape).
    */
  def makeLShape(x0: Double, y0: Double, w: Double, h1: Double,
      w2: Double, h2: Double): Array[Byte] =
    WKB.write(GPolygon(Array(Array(
      x0, y0, x0 + w, y0, x0 + w, y0 + h1,
      x0 + w2, y0 + h1, x0 + w2, y0 + h2, x0, y0 + h2))))

  /** Z/M-drop rewrite (`force_2d`, reference models/_utils.py:311-345). */
  def force2d(wkb: Array[Byte]): Array[Byte] = WKB.force2d(wkb)

  /** Geometry-kind name of a WKB blob ("circle" is a model-level concept;
    * points come back as "point" and are promoted by the caller).
    * Returns UTF8String — the internal string type StaticInvoke expects.
    */
  def geomTypeName(wkb: Array[Byte]): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(WKB.read(wkb) match {
      case _: GPoint => "point"
      case _: GPolygon => "polygon"
      case _: GMultiPolygon => "multipolygon"
    })
}
