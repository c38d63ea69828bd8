package graft.ops

import graft.SparkTestBase
import graft.geom.st._
import graft.model._
import org.apache.spark.sql.functions._

class TransformExtentSpec extends SparkTestBase {
  import spark.implicits._

  test("selectPyramidLevel: coarsest level with sqrt(2) oversampling wins") {
    val t = ScaleT(Seq(4.0, 4.0), Seq("x", "y")) // scale0 px -> cs units
    // bbox 256 units -> 64 scale0 px; target 20 needs >= 28.3 px
    assert(RasterOps.selectPyramidLevel(3, t, Seq(0, 0), Seq(256, 256), 20, 20) == 1)
    // target 50 needs >= 70.7 px: only scale0 (64 < 70.7 too!) -> finest
    assert(RasterOps.selectPyramidLevel(3, t, Seq(0, 0), Seq(256, 256), 50, 50) == 0)
    // tiny target: coarsest qualifies
    assert(RasterOps.selectPyramidLevel(3, t, Seq(0, 0), Seq(256, 256), 4, 4) == 2)
    // single-level pyramid: always 0
    assert(RasterOps.selectPyramidLevel(1, t, Seq(0, 0), Seq(256, 256), 4, 4) == 0)
  }

  test("selectPyramidLevel accounts for rotated bboxes via the transform") {
    // 45-degree rotation: the inverse-transformed bbox is wider than the box
    val r = math.sqrt(2.0) / 2
    val t = AffineT(Matrix(3, 3, Array(r, -r, 0, r, r, 0, 0, 0, 1)),
      Seq("x", "y"), Seq("x", "y"))
    val lvlRot = RasterOps.selectPyramidLevel(4, t, Seq(0, 0), Seq(100, 100), 20, 20)
    val lvlId = RasterOps.selectPyramidLevel(4, IdentityT, Seq(0, 0), Seq(100, 100), 20, 20)
    assert(lvlRot >= lvlId) // rotation never selects a finer level here
  }

  test("transformToDataExtent normalizes points, shapes and labels onto the pixel frame") {
    val pts = Models.PointsModel.parse(
      Seq((1L, 10.0, 0.0), (2L, 30.0, 10.0)).toDF("id", "x", "y"))
    val shp = Models.ShapesModel.parse(
      Seq(Tuple1(7L)).toDF("index")
        .withColumn("geometry", st_make_box(lit(10.0), lit(0.0), lit(30.0), lit(10.0)))
        .withColumn("geom_type", lit("polygon")))
    val lab = Seq((0, 0, 1L), (9, 19, 2L)).toDF("y", "x", "label")
    val sd = SpatialDataset(spark, Seq(
      SpatialElement(Models.PointsModel.meta("pts"), pts),
      SpatialElement(Models.ShapesModel.meta("shp"), shp),
      SpatialElement(ElementMeta("lab", ElementKind.Labels, dims = Seq("y", "x"),
        // labels px -> cs: x' = x + 10 (so labels cover [10,30)x[0,10))
        transforms = Map("global" -> TranslationT(Seq(10.0, 0.0), Seq("x", "y")))), lab)))
    val out = TransformExtent.transformToDataExtent(sd, "global", targetWidth = 40)
    // extent [10,30]x[0,10] -> frame 40 x 20, scale 2x
    val p = out("pts").orderBy("id").select("x", "y").as[(Double, Double)].collect().toSeq
    assert(p == Seq((0.0, 0.0), (40.0, 20.0)))
    val s = out("shp").select("minx", "miny", "maxx", "maxy")
      .as[(Double, Double, Double, Double)].collect()(0)
    assert(s == ((0.0, 0.0, 40.0, 20.0)))
    // label 1 at source (0,0): output px whose centers map into [10,11)x[0,1)
    val l = out("lab").filter(col("label") === 1L)
      .select("y", "x").as[(Int, Int)].collect().toSet
    assert(l == Set((0, 0), (0, 1), (1, 0), (1, 1)))
    // transforms reset to identity
    assert(out.manifest.element("lab").transforms == Map("global" -> IdentityT))
    // maintainPositioning: new transform maps frame px back to cs units
    val kept = TransformExtent.transformToDataExtent(sd, "global",
      targetWidth = 40, maintainPositioning = true)
    val back = kept.manifest.element("pts").transforms("global")
      .toAffineMatrix(Seq("x", "y"), Seq("x", "y"))
    assert(math.abs(back(0, 0) - 0.5) < 1e-12 && math.abs(back(0, 2) - 10.0) < 1e-12)
  }
}
