package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class GeomKernelSpec extends AnyFunSuite {

  /** Structural view of a Geom (case-class equality on Arrays is by ref). */
  private def deep(g: Geom): Any = g match {
    case GPoint(x, y) => (x, y)
    case GPolygon(rings) => rings.map(_.toSeq).toSeq
    case GMultiPolygon(ps) => ps.map(p => p.rings.map(_.toSeq).toSeq).toSeq
  }

  private val unitSquare = GPolygon(Array(Array(0.0, 0, 1, 0, 1, 1, 0, 1)))
  private val square2 = GPolygon(Array(Array(0.0, 0, 2, 0, 2, 2, 0, 2)))
  private val triangle = GPolygon(Array(Array(0.0, 0, 4, 0, 0, 4)))
  private val donut = GPolygon(Array(
    Array(0.0, 0, 4, 0, 4, 4, 0, 4),
    Array(1.0, 1, 3, 1, 3, 3, 1, 3)))

  test("WKB round-trip point/polygon/multipolygon") {
    for (g <- Seq[Geom](GPoint(3.5, -2.25), donut,
        GMultiPolygon(Array(unitSquare, triangle)))) {
      assert(deep(WKB.read(WKB.write(g))) == deep(g))
    }
  }

  test("WKB reads big-endian too") {
    import java.nio.{ByteBuffer, ByteOrder}
    val buf = ByteBuffer.allocate(21).order(ByteOrder.BIG_ENDIAN)
    buf.put(0.toByte).putInt(1).putDouble(7.0).putDouble(8.0)
    assert(WKB.read(buf.array()) == GPoint(7.0, 8.0))
  }

  test("area: square, triangle, donut, multipolygon") {
    assert(GeomKernel.area(WKB.write(unitSquare)) == 1.0)
    assert(GeomKernel.area(WKB.write(triangle)) == 8.0)
    assert(GeomKernel.area(WKB.write(donut)) == 12.0)
    assert(GeomKernel.area(WKB.write(GMultiPolygon(Array(unitSquare, triangle)))) == 9.0)
    // orientation-independent: CW ring same area
    val cw = GPolygon(Array(Array(0.0, 0, 0, 1, 1, 1, 1, 0)))
    assert(GeomKernel.area(WKB.write(cw)) == 1.0)
  }

  test("centroid: square, triangle, multipolygon weighted") {
    val sq = WKB.write(square2)
    assert(GeomKernel.centroidX(sq) == 1.0 && GeomKernel.centroidY(sq) == 1.0)
    val tri = WKB.write(triangle)
    assert(math.abs(GeomKernel.centroidX(tri) - 4.0 / 3) < 1e-12)
    assert(math.abs(GeomKernel.centroidY(tri) - 4.0 / 3) < 1e-12)
    // two unit squares at (0,0) and (10,0): centroid x = 5.5
    val two = WKB.write(GMultiPolygon(Array(unitSquare,
      GPolygon(Array(Array(10.0, 0, 11, 0, 11, 1, 10, 1))))))
    assert(GeomKernel.centroidX(two) == 5.5)
    assert(GeomKernel.centroidY(two) == 0.5)
  }

  test("containsPoint incl. holes and boundary") {
    val d = WKB.write(donut)
    assert(GeomKernel.containsPoint(d, 0.5, 0.5))       // in ring area
    assert(!GeomKernel.containsPoint(d, 2.0, 2.0))      // in hole
    assert(GeomKernel.containsPoint(d, 1.0, 2.0))       // on hole boundary
    assert(GeomKernel.containsPoint(d, 0.0, 0.0))       // on exterior corner
    assert(!GeomKernel.containsPoint(d, 5.0, 5.0))      // outside
    assert(GeomKernel.containsPoint(d, 4.0, 2.0))       // on exterior edge
  }

  test("intersects: disjoint, overlap, containment, touch") {
    def w(g: Geom) = WKB.write(g)
    val far = GPolygon(Array(Array(10.0, 10, 11, 10, 11, 11, 10, 11)))
    assert(!GeomKernel.intersects(w(unitSquare), w(far)))
    assert(GeomKernel.intersects(w(unitSquare), w(square2)))   // contained
    assert(GeomKernel.intersects(w(square2), w(unitSquare)))   // contains
    assert(GeomKernel.intersects(w(triangle), w(square2)))     // overlap
    val touch = GPolygon(Array(Array(1.0, 0, 2, 0, 2, 1, 1, 1)))
    assert(GeomKernel.intersects(w(unitSquare), w(touch)))     // shared edge
    // polygon entirely inside the donut hole: no intersection
    val inHole = GPolygon(Array(Array(1.5, 1.5, 2.5, 1.5, 2.5, 2.5, 1.5, 2.5)))
    assert(!GeomKernel.intersects(w(donut), w(inHole)))
  }

  test("intersectsBox") {
    val t = WKB.write(triangle)
    assert(GeomKernel.intersectsBox(t, -1, -1, 0.5, 0.5))
    assert(!GeomKernel.intersectsBox(t, 3.5, 3.5, 9, 9))
    // box fully inside polygon
    assert(GeomKernel.intersectsBox(t, 0.5, 0.5, 1.0, 1.0))
    // polygon fully inside box
    assert(GeomKernel.intersectsBox(t, -10, -10, 10, 10))
  }

  test("affine transforms all coordinates") {
    // rotate 90° CCW: (x,y) -> (-y, x)
    val got = WKB.read(GeomKernel.affine(WKB.write(unitSquare), 0, -1, 0, 1, 0, 0))
    assert(deep(got) == deep(GPolygon(Array(Array(0.0, 0, 0, 1, -1, 1, -1, 0)))))
    assert(GeomKernel.area(WKB.write(got.asInstanceOf[GPolygon])) == 1.0)
  }

  test("bufferPoint approximates circle area") {
    val wkb = GeomKernel.bufferPoint(5, 5, 2.0, 16)
    val a = GeomKernel.area(wkb)
    assert(math.abs(a - math.Pi * 4) / (math.Pi * 4) < 0.005)
    assert(GeomKernel.containsPoint(wkb, 5, 5))
    assert(!GeomKernel.containsPoint(wkb, 7.5, 5))
  }

  test("clipByConvex and intersectionArea") {
    val clip = WKB.write(unitSquare)
    // triangle ∩ unit square = unit square minus nothing? triangle (0,0),(4,0),(0,4)
    // covers the unit square fully except above x+y=4 — which is outside; area 1
    assert(GeomKernel.intersectionAreaConvex(WKB.write(triangle), clip) == 1.0)
    // shifted square overlapping half
    val shifted = WKB.write(GPolygon(Array(Array(0.5, 0, 1.5, 0, 1.5, 1, 0.5, 1))))
    assert(math.abs(GeomKernel.intersectionAreaConvex(shifted, clip) - 0.5) < 1e-12)
    // disjoint -> null / 0
    val far = WKB.write(GPolygon(Array(Array(10.0, 10, 11, 10, 11, 11, 10, 11))))
    assert(GeomKernel.clipByConvex(far, clip) == null)
    assert(GeomKernel.intersectionAreaConvex(far, clip) == 0.0)
    // triangle (0,0),(1.5,0),(0,1.5) ∩ unit square = 1 - corner triangle 0.125
    val bigTri = WKB.write(GPolygon(Array(Array(0.0, 0, 1.5, 0, 0, 1.5))))
    val got = GeomKernel.intersectionAreaConvex(bigTri, clip)
    assert(math.abs(got - 0.875) < 1e-12)
  }

  test("isConvexRing: convex (either orientation, collinear runs) vs reflex") {
    assert(GeomKernel.isConvexRing(Array(0.0, 0, 4, 0, 4, 4, 0, 4)))
    assert(GeomKernel.isConvexRing(Array(0.0, 0, 0, 4, 4, 4, 4, 0))) // CW
    assert(GeomKernel.isConvexRing(Array(0.0, 0, 2, 0, 4, 0, 4, 4, 0, 4))) // collinear
    assert(GeomKernel.isConvexRing(Array(0.0, 0, 4, 0, 4, 4, 0, 4, 0.0, 0))) // closed form
    // L-shape: reflex at (2, 2)
    assert(!GeomKernel.isConvexRing(Array(0.0, 0, 4, 0, 4, 2, 2, 2, 2, 4, 0, 4)))
    assert(!GeomKernel.isConvexRing(Array(0.0, 0, 1, 0))) // degenerate
  }

  test("clipByConvex keeps subject holes") {
    // donut (outer 4x4, hole 2x2) clipped by square (0,0)-(2,2):
    // exterior clips to the 2x2 corner, hole clips to the 1x1 square
    // (1,1)-(2,2) -> area 4 - 1 = 3
    val clip = WKB.write(square2)
    val out = GeomKernel.clipByConvex(WKB.write(donut), clip)
    assert(out != null)
    WKB.read(out) match {
      case GPolygon(rings) => assert(rings.length == 2, "hole must survive the clip")
      case g => fail(s"expected a polygon, got $g")
    }
    assert(GeomKernel.area(out) == 3.0)
    // the clipped-geometry area must agree with the general kernel
    assert(GeomKernel.area(out) ==
      GeomKernel.intersectionArea(WKB.write(donut), clip))
    // multipolygon subject with a hole in one part
    val mp = WKB.write(GMultiPolygon(Array(donut,
      GPolygon(Array(Array(10.0, 10, 11, 10, 11, 11, 10, 11))))))
    val mout = GeomKernel.clipByConvex(mp, clip)
    assert(GeomKernel.area(mout) == 3.0)
  }

  test("trapezoidDecompose partitions a holed polygon exactly") {
    val traps = GeomKernel.trapezoidDecompose(donut.rings)
    // every band is convex, their areas sum to the donut area (16 - 4)
    assert(traps.forall(GeomKernel.isConvexRing))
    val total = traps.map(r => GeomKernel.area(WKB.write(GPolygon(Array(r))))).sum
    assert(math.abs(total - 12.0) < 1e-12)
    // no band overlaps the hole: band ∩ hole has zero area for each band
    val holeWkb = WKB.write(GPolygon(Array(donut.rings(1))))
    traps.foreach { r =>
      val a = GeomKernel.intersectionArea(WKB.write(GPolygon(Array(r))), holeWkb)
      assert(a < 1e-12, s"band overlaps the hole by $a")
    }
  }

  test("clipGeneral with a HOLED clip polygon (donut)") {
    val donutWkb = WKB.write(donut) // ext [0,4]^2, hole [1,3]^2
    // subject covering everything: clipped area = 16 - 4
    val big = WKB.write(GPolygon(Array(Array(-5.0, -5, 9, -5, 9, 9, -5, 9))))
    val all = GeomKernel.clipGeneral(big, donutWkb)
    assert(all != null && math.abs(GeomKernel.area(all) - 12.0) < 1e-12)
    // subject strictly inside the hole: empty intersection
    val inHole = WKB.write(GPolygon(Array(Array(1.5, 1.5, 2.5, 1.5, 2.5, 2.5, 1.5, 2.5))))
    assert(GeomKernel.clipGeneral(inHole, donutWkb) == null)
    // subject straddling the hole boundary: only the outside-the-hole part
    // survives: [2,3.5]x[2,3.5] minus hole-part [2,3]x[2,3] -> 2.25 - 1
    val straddle = WKB.write(GPolygon(Array(Array(2.0, 2, 3.5, 2, 3.5, 3.5, 2, 3.5))))
    val s = GeomKernel.clipGeneral(straddle, donutWkb)
    assert(s != null && math.abs(GeomKernel.area(s) - 1.25) < 1e-12)
    // agreement with the inclusion-exclusion area kernel (different path)
    assert(math.abs(GeomKernel.area(s) -
      GeomKernel.intersectionArea(straddle, donutWkb)) < 1e-12)
    // points: ring body kept, hole interior dropped
    assert(GeomKernel.clipGeneral(WKB.write(GPoint(0.5, 0.5)), donutWkb) != null)
    assert(GeomKernel.clipGeneral(WKB.write(GPoint(2.0, 2.0)), donutWkb) == null)
  }
}
