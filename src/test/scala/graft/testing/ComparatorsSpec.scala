package graft.testing

import graft.SparkTestBase
import graft.model._
import org.apache.spark.sql.functions._

/** The comparator is the repo's `spatialdata.testing` — it must accept a
  * faithful round-trip, reject every class of divergence with a pointed
  * message, and apply the kind-aware tolerance (shapes less precise,
  * everything else exact) the reference encodes via geopandas
  * `check_less_precise` (testing.py:126).
  */
class ComparatorsSpec extends SparkTestBase {
  import spark.implicits._

  private def pts(xs: Seq[(Long, Double, Double)]) =
    SpatialElement(
      ElementMeta("pts", ElementKind.Points, dims = Seq("x", "y"),
        transforms = Map("global" -> ScaleT(Seq(2.0, 2.0), Seq("y", "x")))),
      xs.toDF("row_id", "x", "y"))

  private val base = pts(Seq((0L, 1.0, 2.0), (1L, 3.0, 4.0)))

  test("identical elements pass; data divergence fails with a row sample") {
    Comparators.assertElementsIdentical(base, base)
    val other = pts(Seq((0L, 1.0, 2.0), (1L, 3.0, 9.0)))
    val e = intercept[AssertionError] {
      Comparators.assertElementsIdentical(base, other)
    }
    assert(e.getMessage.contains("only in"))
  }

  test("transform divergence fails under checkTransformations, passes without") {
    val moved = base.copy(meta = base.meta.copy(
      transforms = Map("global" -> TranslationT(Seq(1.0, 0.0), Seq("y", "x")))))
    val e = intercept[AssertionError] {
      Comparators.assertElementsIdentical(base, moved)
    }
    assert(e.getMessage.contains("transform"))
    Comparators.assertElementsIdentical(base, moved, checkTransformations = false)
  }

  test("checkTransformations without checkMetadata is rejected (reference contract)") {
    intercept[IllegalArgumentException] {
      Comparators.assertElementsIdentical(base, base,
        checkTransformations = true, checkMetadata = false)
    }
  }

  test("shapes get 6-decimal tolerance by default; points compare exact") {
    def shapes(x: Double) = SpatialElement(
      ElementMeta("cells", ElementKind.Shapes),
      Seq((0L, x)).toDF("index", "minx"))
    // 1e-9 perturbation: inside the shapes tolerance, outside exactness
    Comparators.assertElementsIdentical(shapes(1.0), shapes(1.0 + 1e-9))
    intercept[AssertionError] {
      Comparators.assertElementsIdentical(shapes(1.0), shapes(1.0 + 1e-9),
        tolerance = Tolerance.Exact)
    }
    val p0 = pts(Seq((0L, 1.0, 2.0)))
    val p1 = pts(Seq((0L, 1.0 + 1e-9, 2.0)))
    intercept[AssertionError] {
      Comparators.assertElementsIdentical(p0, p1)
    }
    Comparators.assertElementsIdentical(p0, p1, tolerance = Tolerance.Decimals(6))
  }

  test("tolerance reaches inside array columns (raster px payloads)") {
    def img(v: Double) = SpatialElement(
      ElementMeta("img", ElementKind.Images),
      Seq((0, Array(v, 2.0))).toDF("tile_x", "px"))
    intercept[AssertionError] {
      Comparators.assertElementsIdentical(img(1.0), img(1.0 + 1e-9))
    }
    Comparators.assertElementsIdentical(img(1.0), img(1.0 + 1e-9),
      tolerance = Tolerance.Decimals(6))
  }

  test("container compare: name sets, per-element data, attrs") {
    val s0 = SpatialDataset(spark, Seq(base))
    Comparators.assertContainersIdentical(s0, s0)
    val s1 = SpatialDataset(spark, Seq(base.copy(meta = base.meta.copy(name = "other"))))
    val e = intercept[AssertionError] {
      Comparators.assertContainersIdentical(s0, s1)
    }
    assert(e.getMessage.contains("element names differ"))
    val s2 = s0.withAttr("k", org.json4s.JString("v"))
    intercept[AssertionError] {
      Comparators.assertContainersIdentical(s0, s2)
    }
    Comparators.assertContainersIdentical(s0, s2, checkTransformations = false,
      checkMetadata = false)
  }

  test("dtype and column divergence are named in the failure") {
    val a = SpatialElement(ElementMeta("t", ElementKind.Points),
      Seq((0L, 1.0)).toDF("row_id", "x"))
    val b = SpatialElement(ElementMeta("t", ElementKind.Points),
      Seq((0, 1.0)).toDF("row_id", "x")) // row_id int, not long
    val e = intercept[AssertionError] {
      Comparators.assertElementsIdentical(a, b)
    }
    assert(e.getMessage.contains("row_id"))
  }
}
