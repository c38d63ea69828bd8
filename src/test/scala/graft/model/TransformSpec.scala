package graft.model

import org.scalatest.funsuite.AnyFunSuite

class TransformSpec extends AnyFunSuite {

  private def m(rows: Int, cols: Int)(vals: Double*) = Matrix(rows, cols, vals.toArray)

  test("identity pass-through aligns axes by name") {
    val got = IdentityT.toAffineMatrix(Seq("x", "y"), Seq("y", "x"))
    assert(got.sameAs(m(3, 3)(0, 1, 0, 1, 0, 0, 0, 0, 1)))
  }

  test("scale aligns per-axis factors regardless of requested order") {
    val s = ScaleT(Seq(2.0, 3.0), Seq("y", "x"))
    val got = s.toAffineMatrix(Seq("x", "y"), Seq("x", "y"))
    assert(got.sameAs(m(3, 3)(3, 0, 0, 0, 2, 0, 0, 0, 1)))
  }

  test("translation puts offsets in the homogeneous column") {
    val t = TranslationT(Seq(10.0, 20.0), Seq("y", "x"))
    val got = t.toAffineMatrix(Seq("x", "y"), Seq("x", "y"))
    assert(got.sameAs(m(3, 3)(1, 0, 20, 0, 1, 10, 0, 0, 1)))
  }

  test("mapAxis swaps axes") {
    val swap = MapAxisT(Map("x" -> "y", "y" -> "x"))
    val got = swap.toAffineMatrix(Seq("x", "y"), Seq("x", "y"))
    assert(got.sameAs(m(3, 3)(0, 1, 0, 1, 0, 0, 0, 0, 1)))
    assert(swap.inverse.asInstanceOf[MapAxisT].mapAxis == Map("y" -> "x", "x" -> "y"))
  }

  test("affine round-trips through its inverse") {
    val rot = AffineT(m(3, 3)(0, -1, 5, 1, 0, -3, 0, 0, 1), Seq("x", "y"), Seq("x", "y"))
    val prod = rot.toAffineMatrix(Seq("x", "y"), Seq("x", "y")) *
      rot.inverse.toAffineMatrix(Seq("x", "y"), Seq("x", "y"))
    assert(prod.sameAs(Matrix.identity(3)))
  }

  test("sequence composes left-to-right") {
    // scale by 2 then translate by +1 on x: x' = 2x + 1
    val seq = SequenceT(List(
      ScaleT(Seq(2.0), Seq("x")),
      TranslationT(Seq(1.0), Seq("x"))))
    val got = seq.toAffineMatrix(Seq("x"), Seq("x"))
    assert(got.sameAs(m(2, 2)(2, 1, 0, 1)))
    val inv = seq.inverse.toAffineMatrix(Seq("x"), Seq("x"))
    assert((got * inv).sameAs(Matrix.identity(2)))
  }

  test("sequence threads untouched axes through") {
    val seq = SequenceT(List(
      ScaleT(Seq(2.0), Seq("x")),
      TranslationT(Seq(7.0), Seq("y"))))
    val got = seq.toAffineMatrix(Seq("x", "y"), Seq("x", "y"))
    assert(got.sameAs(m(3, 3)(2, 0, 0, 0, 1, 7, 0, 0, 1)))
  }

  test("affine passes through axes it does not define") {
    // 2D affine applied in (c, y, x) space: c passes through.
    val a = AffineT(m(3, 3)(2, 0, 1, 0, 3, 2, 0, 0, 1), Seq("x", "y"), Seq("x", "y"))
    val got = a.toAffineMatrix(Seq("c", "y", "x"), Seq("c", "y", "x"))
    assert(got.sameAs(m(4, 4)(
      1, 0, 0, 0,
      0, 3, 0, 2,
      0, 0, 2, 1,
      0, 0, 0, 1)))
  }

  test("matrix inverse of a known 3x3") {
    val a = m(3, 3)(2, 0, 4, 0, 5, 0, 0, 0, 1)
    assert(a.inverseMatrix.sameAs(m(3, 3)(0.5, 0, -2, 0, 0.2, 0, 0, 0, 1)))
  }
}

class CsGraphSpec extends AnyFunSuite {
  private val scale = ScaleT(Seq(2.0, 2.0), Seq("y", "x"))
  private val shift = TranslationT(Seq(5.0, 5.0), Seq("y", "x"))

  private val manifest = GraftManifest("0.1", Seq(
    ElementMeta("pts", ElementKind.Points, Seq("x", "y"),
      transforms = Map("global" -> scale)),
    ElementMeta("img", ElementKind.Images, Seq("c", "y", "x"),
      transforms = Map("global" -> shift, "micron" -> IdentityT))))

  test("direct edge resolves without search") {
    assert(CsGraph.elementToCs(manifest, "pts", "global") == scale)
  }

  test("multi-hop path composes transforms") {
    // pts -> global -> img -> micron
    val t = CsGraph.elementToCs(manifest, "pts", "micron")
    val got = t.toAffineMatrix(Seq("x", "y"), Seq("x", "y"))
    // x' = (2x - 5); scale into global, inverse-shift into img space, identity to micron
    val expect = Matrix(3, 3, Array(2, 0, -5, 0, 2, -5, 0, 0, 1))
    assert(got.sameAs(expect))
  }

  test("missing path throws") {
    intercept[IllegalArgumentException] {
      CsGraph.resolve(manifest, CsGraph.ElementNode("pts"), CsGraph.CsNode("nope"))
    }
  }
}

class ManifestSpec extends AnyFunSuite {
  test("manifest JSON round-trip preserves everything") {
    val m0 = GraftManifest("0.1", Seq(
      ElementMeta("cells", ElementKind.Shapes, Seq("x", "y"),
        transforms = Map(
          "global" -> SequenceT(List(ScaleT(Seq(2.0, 3.0), Seq("y", "x")),
            TranslationT(Seq(1.0, -1.0), Seq("y", "x")))),
          "rot" -> AffineT(Matrix(3, 3, Array(0, -1, 0, 1, 0, 0, 0, 0, 1)),
            Seq("x", "y"), Seq("x", "y"))),
        attrs = Map("radius" -> "present")),
      ElementMeta("tbl", ElementKind.Tables,
        table = Some(TableAnnotation(Seq("cells"), "region", "instance_id")))),
      attrs = Map("source" -> "unit-test"))
    val m1 = GraftManifest.fromJson(GraftManifest.toJson(m0))
    assert(m1.version == m0.version)
    assert(m1.attrs == m0.attrs)
    assert(m1.elements.map(_.name) == m0.elements.map(_.name))
    val c0 = m0.element("cells"); val c1 = m1.element("cells")
    assert(c1.transforms.keySet == c0.transforms.keySet)
    assert(c1.transforms("global").toAffineMatrix(Seq("x", "y"), Seq("x", "y"))
      .sameAs(c0.transforms("global").toAffineMatrix(Seq("x", "y"), Seq("x", "y"))))
    assert(c1.attrs == c0.attrs)
    assert(m1.element("tbl").table.contains(TableAnnotation(Seq("cells"), "region", "instance_id")))
  }

  test("duplicate names rejected case-insensitively") {
    intercept[IllegalArgumentException] {
      GraftManifest("0.1", Seq(
        ElementMeta("A", ElementKind.Points),
        ElementMeta("a", ElementKind.Points)))
    }
  }
}
