package graft.model

import graft.SparkTestBase
import graft.ops.Landmarks

/** Mirrors the reference's decomposition/landmark cases
  * (tests/transformations/test_transformations.py): recomposition
  * invariants, component structure, similarity recovery, flip detection.
  */
class DecomposeLandmarksSpec extends SparkTestBase {
  import spark.implicits._

  private val axes = Seq("x", "y")

  private def affine(m: Double*): AffineT =
    AffineT(Matrix(3, 3, m.toArray), axes, axes)

  test("simple decomposition: linear + translation recompose") {
    val t = affine(1.5, 0.3, 7.0, -0.2, 2.0, -4.0, 0, 0, 1)
    val seq = Decompose.decompose(t, axes, simple = true)
    assert(seq.transforms.length == 2)
    assert(seq.transforms(0).isInstanceOf[AffineT])
    assert(seq.transforms(1) == TranslationT(Seq(7.0, -4.0), axes))
    assert(seq.toAffineMatrix(axes, axes).sameAs(t.toAffineMatrix(axes, axes)))
  }

  test("full decomposition: inversion/rotation/shear/scale/translation invariants") {
    for (t <- Seq(
      affine(1.5, 0.3, 7.0, -0.2, 2.0, -4.0, 0, 0, 1),
      affine(-2.0, 0.5, 1.0, 0.1, 0.8, 2.0, 0, 0, 1), // reflection
      affine(0.0, -3.0, 0.0, 2.0, 0.0, 0.0, 0, 0, 1), // pure rotation+scale
      affine(1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0, 0, 1))) { // identity
      val seq = Decompose.decompose(t, axes, simple = false)
      val List(inv, rot, shear, scale, trans) = seq.transforms
      // inversion: scale with entries in {-1, 1}
      val ScaleT(invS, _) = inv: @unchecked
      assert(invS.forall(v => v == 1.0 || v == -1.0))
      // rotation: determinant 1, no translation
      val rm = rot.toAffineMatrix(axes, axes)
      assert(math.abs(rm(0, 0) * rm(1, 1) - rm(0, 1) * rm(1, 0) - 1.0) < 1e-9)
      assert(rm(0, 2) == 0.0 && rm(1, 2) == 0.0)
      // shear: upper triangular, unit diagonal
      val sm = shear.toAffineMatrix(axes, axes)
      assert(sm(0, 0) == 1.0 && sm(1, 1) == 1.0 && sm(1, 0) == 0.0)
      // scale: strictly positive
      val ScaleT(scS, _) = scale: @unchecked
      assert(scS.forall(_ > 0.0))
      assert(trans.isInstanceOf[TranslationT])
      // recomposition (also asserted inside decompose)
      assert(seq.toAffineMatrix(axes, axes).sameAs(t.toAffineMatrix(axes, axes), 1e-8))
    }
  }

  test("decomposition with c axis passes the channel through") {
    val t = ScaleT(Seq(2.0, 3.0), axes)
    val seq = Decompose.decompose(t, Seq("c", "x", "y"), simple = false)
    assert(seq.toAffineMatrix(axes, axes).sameAs(t.toAffineMatrix(axes, axes), 1e-8))
    // z is rejected, as is a transform touching c
    intercept[IllegalArgumentException] {
      Decompose.decompose(t, Seq("z", "x", "y"))
    }
    intercept[IllegalArgumentException] {
      Decompose.decompose(ScaleT(Seq(2.0, 2.0, 2.0), Seq("c", "x", "y")), Seq("c", "x", "y"))
    }
  }

  test("estimateSimilarity recovers a known rotation+scale+translation") {
    val src = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (2.0, 3.0))
    val s = 2.5; val th = 0.7; val (tx, ty) = (4.0, -1.0)
    val (c, sn) = (math.cos(th), math.sin(th))
    val dst = src.map { case (x, y) =>
      (s * (c * x - sn * y) + tx, s * (sn * x + c * y) + ty) }
    val m = Landmarks.estimateSimilarity(src, dst)
    assert(math.abs(m(0, 0) - s * c) < 1e-9 && math.abs(m(0, 1) + s * sn) < 1e-9)
    assert(math.abs(m(0, 2) - tx) < 1e-9 && math.abs(m(1, 2) - ty) < 1e-9)
  }

  test("estimateAffine recovers a known anisotropic affine exactly") {
    val src = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (3.0, 2.0))
    val dst = src.map { case (x, y) => (2.0 * x - 0.5 * y + 1.0, 0.3 * x + 4.0 * y - 2.0) }
    val m = Landmarks.estimateAffine(src, dst)
    assert(math.abs(m(0, 0) - 2.0) < 1e-9 && math.abs(m(0, 1) + 0.5) < 1e-9)
    assert(math.abs(m(1, 0) - 0.3) < 1e-9 && math.abs(m(1, 1) - 4.0) < 1e-9)
    assert(math.abs(m(0, 2) - 1.0) < 1e-9 && math.abs(m(1, 2) + 2.0) < 1e-9)
  }

  test("transformationBetweenLandmarks maps moving onto references; flip detected") {
    // similarity case (the reference's docstring example, scaled x10)
    val moving = Seq((0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (1.0, 0.0)).toDF("x", "y")
    val refs = moving.select((moving("x") * 10).as("x"), (moving("y") * 10).as("y"))
    val t = Landmarks.transformationBetweenLandmarks(refs, moving)
    val m = t.toAffineMatrix(Seq("x", "y"), Seq("x", "y"))
    assert(math.abs(m(0, 0) - 10.0) < 1e-9 && math.abs(m(1, 1) - 10.0) < 1e-9)

    // mirrored landmarks: flip branch engages and still maps exactly
    val movXy = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (0.0, 2.0), (1.0, 1.0))
    val refXy = movXy.map { case (x, y) => (-x + 7.0, y + 1.0) } // reflection + shift
    val tf = Landmarks.transformationBetweenLandmarks(
      refXy.toDF("x", "y"), movXy.toDF("x", "y"))
    val mf = tf.toAffineMatrix(Seq("x", "y"), Seq("x", "y"))
    val det = mf(0, 0) * mf(1, 1) - mf(0, 1) * mf(1, 0)
    assert(det < 0, s"expected reflective map, det=$det")
    movXy.zip(refXy).foreach { case ((x, y), (rx, ry)) =>
      val px = mf(0, 0) * x + mf(0, 1) * y + mf(0, 2)
      val py = mf(1, 0) * x + mf(1, 1) * y + mf(1, 2)
      assert(math.abs(px - rx) < 1e-9 && math.abs(py - ry) < 1e-9)
    }
  }

  test("alignElementsUsingLandmarks registers both elements into the new cs") {
    val pts = Models.PointsModel.parse(Seq((1L, 0.0, 0.0), (2L, 1.0, 1.0)).toDF("id", "x", "y"))
    val sd = SpatialDataset(spark, Seq(
      SpatialElement(Models.PointsModel.meta("ref",
        transforms = Map("global" -> IdentityT)), pts),
      SpatialElement(Models.PointsModel.meta("mov",
        transforms = Map("global" -> ScaleT(Seq(2.0, 2.0), Seq("x", "y")))), pts)))
    val landmarksMov = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0)).toDF("x", "y")
    val landmarksRef = Seq((5.0, 5.0), (7.0, 5.0), (5.0, 7.0)).toDF("x", "y")
    val (out, newT) = Landmarks.alignElementsUsingLandmarks(sd,
      landmarksRef, landmarksMov, "ref", "mov", newCs = "aligned")
    assert(out.manifest.element("ref").transforms("aligned") == IdentityT)
    val m = newT.toAffineMatrix(Seq("x", "y"), Seq("x", "y"))
    // mov cs -> aligned: scale 2 (old) then landmark similarity (scale 2, shift 5)
    assert(math.abs(m(0, 0) - 4.0) < 1e-9 && math.abs(m(0, 2) - 5.0) < 1e-9)
  }
}
