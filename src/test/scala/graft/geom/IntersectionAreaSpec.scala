package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** General (non-convex) polygon intersection area: ear triangulation +
  * convex-clip decomposition, checked against analytic areas.
  */
class IntersectionAreaSpec extends AnyFunSuite {

  private def poly(rings: Array[Double]*): Array[Byte] =
    WKB.write(GPolygon(rings.toArray))

  private def box(x0: Double, y0: Double, x1: Double, y1: Double): Array[Byte] =
    poly(Array(x0, y0, x1, y0, x1, y1, x0, y1))

  private def ia(a: Array[Byte], b: Array[Byte]): Double =
    GeomKernel.intersectionArea(a, b)

  private val eps = 1e-9

  test("ear triangulation covers the polygon exactly") {
    // non-convex L-shape, area 12
    val l = Array(0.0, 0, 4, 0, 4, 2, 2, 2, 2, 4, 0, 4)
    val tris = GeomKernel.earTriangulate(l)
    val total = tris.map { t =>
      math.abs((t(2) - t(0)) * (t(5) - t(1)) - (t(4) - t(0)) * (t(3) - t(1))) / 2
    }.sum
    assert(math.abs(total - 12.0) < eps)
    assert(tris.length == 4) // n-2 triangles
  }

  test("box-box agrees with the convex kernel") {
    val a = box(0, 0, 4, 4); val b = box(2, 2, 6, 6)
    assert(math.abs(ia(a, b) - 4.0) < eps)
    assert(math.abs(ia(a, b) - GeomKernel.intersectionAreaConvex(a, b)) < eps)
  }

  test("non-convex L-shape against a box") {
    val l = poly(Array(0.0, 0, 4, 0, 4, 2, 2, 2, 2, 4, 0, 4))
    // box covering the notch corner: only the L part inside counts
    assert(math.abs(ia(l, box(1, 1, 3, 3)) - 3.0) < eps) // 4 minus the 1x1 notch quadrant
    // box fully inside the lower arm
    assert(math.abs(ia(l, box(0.5, 0.5, 1.5, 1.5)) - 1.0) < eps)
    // disjoint
    assert(ia(l, box(10, 10, 12, 12)) == 0.0)
    // order symmetric
    assert(math.abs(ia(box(1, 1, 3, 3), l) - 3.0) < eps)
  }

  test("star (self-touching concavities) against a half-plane box") {
    // 4-point star around (0,0), alternating radius 3 and 1
    val pts = (0 until 8).map { i =>
      val r = if (i % 2 == 0) 3.0 else 1.0
      val th = math.Pi / 4 * i
      (r * math.cos(th), r * math.sin(th))
    }
    val star = poly(pts.flatMap(p => Seq(p._1, p._2)).toArray)
    val full = GeomKernel.area(star)
    // clip by a huge box = the star itself
    assert(math.abs(ia(star, box(-10, -10, 10, 10)) - full) < eps)
    // half-plane x >= 0 gets exactly half (the star is x-symmetric)
    assert(math.abs(ia(star, box(0, -10, 10, 10)) - full / 2) < 1e-6)
  }

  test("holes subtract via inclusion-exclusion") {
    // 6x6 square with a 2x2 hole in the middle
    val withHole = poly(
      Array(0.0, 0, 6, 0, 6, 6, 0, 6),
      Array(2.0, 2, 4, 2, 4, 4, 2, 4))
    assert(math.abs(GeomKernel.area(withHole) - 32.0) < eps)
    // clip box covering the hole entirely: 4x4 minus 2x2 hole
    assert(math.abs(ia(withHole, box(1, 1, 5, 5)) - 12.0) < eps)
    // clip box inside the hole: zero
    assert(ia(withHole, box(2.5, 2.5, 3.5, 3.5)) == 0.0)
    // both polygons have holes
    val other = poly(
      Array(1.0, 1, 5, 1, 5, 5, 1, 5),
      Array(2.5, 2.5, 3.5, 2.5, 3.5, 3.5, 2.5, 3.5))
    // other area 15; overlap = (4x4 ring region) ∩ other
    // = other minus other∩hole(2x2) = 15 - (2x2 minus other's hole 1x1... )
    // compute directly: region = [1,5]^2 minus [2,4]^2 (12) minus other's
    // hole [2.5,3.5]^2 which lies inside [2,4]^2 already -> 12
    assert(math.abs(ia(withHole, other) - 12.0) < eps)
  }

  test("multipolygon members sum") {
    val mp = WKB.write(GMultiPolygon(Array(
      GPolygon(Array(Array(0.0, 0, 2, 0, 2, 2, 0, 2))),
      GPolygon(Array(Array(10.0, 0, 12, 0, 12, 2, 0 + 10, 2))))))
    assert(math.abs(ia(mp, box(-1, -1, 13, 3)) - 8.0) < eps)
    assert(math.abs(ia(mp, box(1, 0, 11, 2)) - 4.0) < eps) // 1x2 of each
  }

  test("CW-oriented input rings give the same areas") {
    val ccw = poly(Array(0.0, 0, 4, 0, 4, 2, 2, 2, 2, 4, 0, 4))
    val cw = poly(Array(0.0, 4, 2, 4, 2, 2, 4, 2, 4, 0, 0, 0))
    assert(math.abs(ia(ccw, box(1, 1, 3, 3)) - ia(cw, box(1, 1, 3, 3))) < eps)
  }
}
