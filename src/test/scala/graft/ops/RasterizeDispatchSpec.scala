package graft.ops

import graft.SparkTestBase
import graft.geom.st._
import graft.model._
import org.apache.spark.sql.functions._

class RasterizeDispatchSpec extends SparkTestBase {
  import spark.implicits._

  private def container(): SpatialDataset = {
    val pts = Models.PointsModel.parse(
      Seq.tabulate(100)(i => (i.toLong, (i % 10).toDouble, (i / 10).toDouble))
        .toDF("id", "x", "y"))
    val shp = Models.ShapesModel.parse(
      Seq((5L, 1.0, 1.0), (8L, 6.0, 4.0)).toDF("index", "x0", "y0")
        .withColumn("geometry", st_make_box(col("x0"), col("y0"),
          col("x0") + 3.0, col("y0") + 2.0))
        .withColumn("geom_type", lit("polygon")).drop("x0", "y0"))
    val lab = Seq.tabulate(50)(i => (i % 7, i % 9, (i % 3 + 1).toLong))
      .toDF("y", "x", "label").distinct()
    val img = RasterOps.pixelsToTiles(
      Seq.tabulate(64)(i => (0, i / 8, i % 8, (i + 1).toDouble)).toDF("c", "y", "x", "value"),
      tileSize = 8)
    SpatialDataset(spark, Seq(
      SpatialElement(Models.PointsModel.meta("pts",
        transforms = Map("global" -> ScaleT(Seq(2.0, 2.0), Seq("x", "y")))), pts),
      SpatialElement(Models.ShapesModel.meta("shp"), shp),
      SpatialElement(ElementMeta("lab", ElementKind.Labels, Seq("y", "x")), lab),
      SpatialElement(Models.ImageModel.meta("img"), img)))
  }

  test("rasterize dispatches per element kind onto one target grid") {
    val sd = container()
    // points: cs coords are 2x intrinsic -> grid [0,20)^2 at 1 unit/px
    val p = RasterOps.rasterize(sd, "pts", "global",
      Seq(0.0, 0.0), Seq(20.0, 20.0), 20, 20)
    assert(p.agg(sum("value")).as[Long].collect()(0) == 100L) // every point lands
    val direct = RasterOps.rasterizePoints(
      TransformOps.transformPoints(sd("pts"), sd.transformTo("pts", "global")),
      0.0, 0.0, 1.0, 1.0, 20, 20)
    assert(p.orderBy("y", "x").collect().toSeq == direct.orderBy("y", "x").collect().toSeq)
    // shapes: first-wins index labels
    val s = RasterOps.rasterize(sd, "shp", "global", Seq(0.0, 0.0), Seq(10.0, 10.0), 10, 10)
    val sVals = s.select("value").distinct().as[Long].collect().toSet
    assert(sVals == Set(5L, 8L))
    // labels: identity resample reproduces the long-form raster
    val l = RasterOps.rasterize(sd, "lab", "global", Seq(0.0, 0.0), Seq(9.0, 7.0), 9, 7)
    val want = sd("lab").select("y", "x", "label").as[(Int, Int, Long)].collect().toSet
    assert(l.select("y", "x", "label").as[(Int, Int, Long)].collect().toSet == want)
    // images: identity resample reproduces pixels (channel kept)
    val i = RasterOps.rasterize(sd, "img", "global", Seq(0.0, 0.0), Seq(8.0, 8.0), 8, 8)
    assert(i.agg(sum("value")).as[Double].collect()(0) == (1 to 64).sum.toDouble)
    assert(i.columns.contains("c"))
  }

  test("rasterize3d dispatches points and 3D labels; shapes refuse (2D data model)") {
    val pts3d = Seq.tabulate(60)(i =>
      (i.toLong, (i % 5).toDouble, (i / 5 % 4).toDouble, (i / 20).toDouble))
      .toDF("id", "x", "y", "z")
    val lab3d = (for (z <- 0 until 2; y <- 0 until 3; x <- 0 until 4)
      yield (z, y, x, (z * 12 + y * 4 + x + 1).toLong)).toDF("z", "y", "x", "label")
    val shp = Models.ShapesModel.parse(
      Seq((1L, 0.0, 0.0)).toDF("index", "x0", "y0")
        .withColumn("geometry", st_make_box(col("x0"), col("y0"),
          col("x0") + 2.0, col("y0") + 2.0))
        .withColumn("geom_type", lit("polygon")).drop("x0", "y0"))
    val sd = SpatialDataset(spark, Seq(
      SpatialElement(ElementMeta("p3", ElementKind.Points, Seq("x", "y", "z"),
        transforms = Map("global" -> ScaleT(Seq(2.0, 2.0, 2.0), Seq("x", "y", "z")))),
        pts3d),
      SpatialElement(ElementMeta("l3", ElementKind.Labels, Seq("z", "y", "x")), lab3d),
      SpatialElement(Models.ShapesModel.meta("shp"), shp)))
    // points: cs = 2x intrinsic -> [0,10)x[0,8)x[0,6) at 1 unit/voxel
    val p = RasterOps.rasterize3d(sd, "p3", "global",
      Seq(0.0, 0.0, 0.0), Seq(10.0, 8.0, 6.0), 10, 8, 6)
    assert(p.agg(sum("value")).as[Long].collect()(0) == 60L)
    val direct = RasterOps.rasterizePoints3d(
      TransformOps.transformPoints(sd("p3"),
        sd.transformTo("p3", "global"), Seq("x", "y", "z")),
      0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 10, 8, 6)
    assert(p.orderBy("z", "y", "x").collect().toSeq ==
      direct.orderBy("z", "y", "x").collect().toSeq)
    // 3D labels: identity resample reproduces the volume
    val l = RasterOps.rasterize3d(sd, "l3", "global",
      Seq(0.0, 0.0, 0.0), Seq(4.0, 3.0, 2.0), 4, 3, 2)
    val want = lab3d.select("z", "y", "x", "label").as[(Int, Int, Int, Long)].collect().toSet
    assert(l.select("z", "y", "x", "label").as[(Int, Int, Int, Long)].collect().toSet == want)
    // shapes: 2D by the data model -> loud refusal
    val e = intercept[RuntimeException] {
      RasterOps.rasterize3d(sd, "shp", "global",
        Seq(0.0, 0.0, 0.0), Seq(4.0, 4.0, 4.0), 4, 4, 4)
    }
    assert(e.getMessage.contains("no z axis"), e.getMessage)
  }

  test("rasterizeBinsAffine recovers the bin-grid affine exactly") {
    // bins laid out at x = 2*col + 10, y = 3*row - 5
    val obs = Seq.tabulate(40)(i => (i / 8, i % 8, 2.0 * (i % 8) + 10.0, 3.0 * (i / 8) - 5.0))
      .toDF("bin_row", "bin_col", "x", "y")
    val t = RasterOps.rasterizeBinsAffine(obs, "bin_row", "bin_col", "x", "y")
    val m = t.toAffineMatrix(Seq("x", "y"), Seq("x", "y"))
    assert(math.abs(m(0, 0) - 2.0) < 1e-9 && math.abs(m(0, 2) - 10.0) < 1e-9)
    assert(math.abs(m(1, 1) - 3.0) < 1e-9 && math.abs(m(1, 2) + 5.0) < 1e-9)
  }

  test("setChannelNames updates image metadata only") {
    val sd = container()
    val out = sd.setChannelNames("img", Seq("DAPI"))
    assert(out.manifest.element("img").channelNames == Seq("DAPI"))
    assert(sd.manifest.element("img").channelNames.isEmpty)
    intercept[IllegalArgumentException] { sd.setChannelNames("pts", Seq("x")) }
  }
}
