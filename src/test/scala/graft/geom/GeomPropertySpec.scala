package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the geometry kernel: invariants that must hold for
  * ANY simple polygon, checked over generated convex polygons (random
  * point sets -> convex hull) and generated rectilinear non-convex
  * staircases.
  */
class GeomPropertySpec extends AnyFunSuite {

  /** Deterministic sampling (no scalatest-scalacheck bridge in the cache):
    * draw `n` values with sequential seeds.
    */
  private def samples[A](g: Gen[A], n: Int = 60): Seq[A] =
    (0 until (n * 3)).iterator
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
      .take(n).toSeq

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit = samples(g).foreach(f)

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    samples(g1).zip(samples(g2).reverse).foreach { case (a, b) => f(a, b) }

  private val coord = Gen.chooseNum(-20.0, 20.0).map(v => math.rint(v * 4) / 4)

  /** Convex polygon via gift-wrap hull of >= 3 random points. */
  private val convexPoly: Gen[Array[Double]] =
    Gen.chooseNum(3, 9).flatMap { n =>
      Gen.listOfN(n * 3, coord).map { cs =>
        val pts = cs.grouped(2).collect { case List(a, b) => (a, b) }.toSeq.distinct
        hull(pts)
      }
    }.suchThat(r => r.length >= 6 && math.abs(shoelace(r)) > 0.5)

  /** Rectilinear staircase: non-convex, simple by construction. */
  private val staircase: Gen[Array[Double]] =
    for {
      x0 <- coord; y0 <- coord
      steps <- Gen.chooseNum(2, 4)
      ws <- Gen.listOfN(steps, Gen.chooseNum(1, 4))
      hs <- Gen.listOfN(steps, Gen.chooseNum(1, 4))
    } yield {
      // up-right staircase then close along the axes
      val pts = scala.collection.mutable.ArrayBuffer[(Double, Double)]((x0, y0))
      var (x, y) = (x0, y0)
      ws.zip(hs).foreach { case (w, h) =>
        x += w; pts += ((x, y))
        y += h; pts += ((x, y))
      }
      pts += ((x0, y))
      pts.flatMap(p => Seq(p._1, p._2)).toArray
    }

  private def shoelace(r: Array[Double]): Double = {
    var a = 0.0
    val n = r.length / 2
    for (i <- 0 until n) {
      val j = (i + 1) % n
      a += r(2 * i) * r(2 * j + 1) - r(2 * j) * r(2 * i + 1)
    }
    a / 2
  }

  private def hull(pts: Seq[(Double, Double)]): Array[Double] = {
    if (pts.size < 3) return Array.empty
    val sorted = pts.sortBy(p => (p._1, p._2))
    def half(ps: Seq[(Double, Double)]): Seq[(Double, Double)] =
      ps.foldLeft(List.empty[(Double, Double)]) { (acc, p) =>
        var a = acc
        while (a.size >= 2 && {
          val (x1, y1) = a(1); val (x2, y2) = a.head
          (x2 - x1) * (p._2 - y1) - (p._1 - x1) * (y2 - y1) <= 0
        }) a = a.tail
        p :: a
      }.reverse
    val lower = half(sorted).dropRight(1)
    val upper = half(sorted.reverse).dropRight(1)
    (lower ++ upper).flatMap(p => Seq(p._1, p._2)).toArray
  }

  private def wkb(r: Array[Double]): Array[Byte] = WKB.write(GPolygon(Array(r)))

  test("intersection area is symmetric and bounded by both areas") {
    forAll(convexPoly, staircase) { (c, s) =>
      val a = wkb(c); val b = wkb(s)
      val ab = GeomKernel.intersectionArea(a, b)
      val ba = GeomKernel.intersectionArea(b, a)
      assert(math.abs(ab - ba) < 1e-6, s"symmetry: $ab vs $ba")
      assert(ab >= -1e-9)
      assert(ab <= GeomKernel.area(a) + 1e-6)
      assert(ab <= GeomKernel.area(b) + 1e-6)
    }
  }

  test("clipGeneral area equals intersectionArea for reflex clips") {
    forAll(convexPoly, staircase) { (c, s) =>
      val subject = wkb(c); val clip = wkb(s)
      val clipped = GeomKernel.clipGeneral(subject, clip)
      val got = if (clipped == null) 0.0 else GeomKernel.area(clipped)
      val want = GeomKernel.intersectionArea(subject, clip)
      assert(math.abs(got - want) < 1e-6, s"clip area $got vs kernel $want")
    }
    // and for convex clips it is bit-identical to the single-pass path
    forAll(convexPoly, convexPoly) { (c1, c2) =>
      val a = wkb(c1); val b = wkb(c2)
      val g = GeomKernel.clipGeneral(a, b)
      val v = GeomKernel.clipByConvex(a, b)
      assert((g == null) == (v == null))
      if (g != null) assert(java.util.Arrays.equals(g, v))
    }
  }

  test("holed-clip partition area equals inclusion-exclusion intersectionArea") {
    // the two kernels compute the same quantity through disjoint machinery:
    // clipGeneral = trapezoid-band partition, intersectionArea = per-ring
    // triangulation with hole sign inclusion-exclusion
    val donut = WKB.write(GPolygon(Array(
      Array(0.0, 0.0, 12.0, 0.0, 12.0, 9.0, 0.0, 9.0),
      Array(4.0, 3.0, 8.0, 3.0, 8.0, 6.0, 4.0, 6.0))))
    forAll(convexPoly, staircase) { (c, s) =>
      for (subject <- Seq(wkb(c), wkb(s))) {
        val clipped = GeomKernel.clipGeneral(subject, donut)
        val got = if (clipped == null) 0.0 else GeomKernel.area(clipped)
        val want = GeomKernel.intersectionArea(subject, donut)
        assert(math.abs(got - want) < 1e-6, s"holed clip area $got vs kernel $want")
      }
    }
  }

  test("self-intersection equals own area; convex kernel agrees on convex pairs") {
    forAll(convexPoly) { c =>
      val a = wkb(c)
      assert(math.abs(GeomKernel.intersectionArea(a, a) - GeomKernel.area(a)) < 1e-6)
    }
    forAll(convexPoly, convexPoly) { (c1, c2) =>
      val a = wkb(c1); val b = wkb(c2)
      val general = GeomKernel.intersectionArea(a, b)
      val convex = GeomKernel.intersectionAreaConvex(a, b)
      assert(math.abs(general - convex) < 1e-6, s"general $general vs convex $convex")
    }
  }

  test("staircase area from triangulation matches the shoelace formula") {
    forAll(staircase) { s =>
      val tris = GeomKernel.earTriangulate(s)
      val triArea = tris.map { t =>
        math.abs((t(2) - t(0)) * (t(5) - t(1)) - (t(4) - t(0)) * (t(3) - t(1))) / 2
      }.sum
      assert(math.abs(triArea - math.abs(shoelace(s))) < 1e-9,
        s"tri $triArea vs shoelace ${math.abs(shoelace(s))}")
    }
  }

  test("affine transform scales areas by |det|") {
    forAll(convexPoly) { c =>
      val a = wkb(c)
      val t = GeomKernel.affine(a, 2.0, 1.0, 3.0, 0.5, 3.0, -1.0)
      val det = 2.0 * 3.0 - 1.0 * 0.5
      assert(math.abs(GeomKernel.area(t) - det * GeomKernel.area(a)) < 1e-6)
    }
  }
}
