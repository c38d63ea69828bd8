package graft.ops

import graft.SparkTestBase
import graft.geom.st._
import graft.model._
import org.apache.spark.sql.functions._

class ImageTilesSpec extends SparkTestBase {
  import spark.implicits._

  // 1-channel 12x12 gradient image: value = y*100 + x + 1 (all nonzero)
  private def pixels = (for (y <- 0 until 12; x <- 0 until 12)
    yield (0, y, x, (y * 100 + x + 1).toDouble)).toDF("c", "y", "x", "value")

  private def circleRegions(rows: Seq[(Long, Double, Double, Double)]) =
    Models.ShapesModel.parse(rows.toDF("index", "cx", "cy", "radius")
      .withColumn("geometry", st_point(col("cx"), col("cy")))
      .withColumn("geom_type", lit("circle")).drop("cx", "cy"),
      radiusCol = Some("radius"))

  test("tileCoords: extent from tile_scale and from tile_dim_in_units") {
    val r = circleRegions(Seq((1L, 5.0, 6.0, 2.0)))
    val byScale = ImageTiles.tileCoords(r, tileScale = 2.0)
      .select("x", "y", "extent", "minx", "maxy").as[(Double, Double, Double, Double, Double)]
      .collect()(0)
    assert(byScale == ((5.0, 6.0, 8.0, 1.0, 10.0)))
    val byDim = ImageTiles.tileCoords(r, tileDimInUnits = Some(3.0))
      .select("extent", "minx", "maxx").as[(Double, Double, Double)].collect()(0)
    assert(byDim == ((3.0, 3.5, 6.5)))
  }

  test("tileCoords transforms centroids and scales the radius") {
    val r = circleRegions(Seq((1L, 2.0, 3.0, 1.0)))
    val t = ScaleT(Seq(3.0, 3.0), Seq("x", "y"))
    val got = ImageTiles.tileCoords(r, t).select("x", "y", "extent")
      .as[(Double, Double, Double)].collect()(0)
    assert(got == ((6.0, 9.0, 6.0))) // extent = 2 * (radius * 3)
  }

  test("tileBatch assembles exact dense crops (every cell size)") {
    val r = circleRegions(Seq((1L, 3.0, 3.0, 2.0), (2L, 8.5, 8.5, 1.5)))
    val coords = ImageTiles.tileCoords(r) // tiles [1,5)^2 and [7,10)^2
    for (cell <- Seq(2.0, 4.0, 16.0)) {
      val batch = ImageTiles.tileBatch(pixels, coords, cell)
        .select("instance_id", "th", "tw", "px")
        .as[(Long, Int, Int, Seq[Double])].collect().sortBy(_._1)
      assert(batch.map(b => (b._1, b._2, b._3)).toSeq == Seq((1L, 4, 4), (2L, 3, 3)))
      val t1 = batch(0)._4
      // tile 1 covers y,x in [1,5): top-left pixel = 1*100+1+1
      assert(t1(0) == 102.0 && t1(5) == 203.0 && t1.length == 16)
      val t2 = batch(1)._4
      assert(t2(0) == 708.0 && t2.length == 9) // y=7,x=7
    }
  }

  test("tileBatch zero-fills pixels outside the raster") {
    val r = circleRegions(Seq((1L, 0.5, 0.5, 1.5))) // tile [-1,2)^2, row/col -1 absent
    val batch = ImageTiles.tileBatch(pixels, ImageTiles.tileCoords(r), cell = 4.0)
      .select("th", "tw", "px").as[(Int, Int, Seq[Double])].collect()(0)
    assert(batch._1 == 3 && batch._2 == 3)
    val px = batch._3
    assert(px(0) == 0.0 && px(1) == 0.0 && px(3) == 0.0) // y=-1 row, x=-1 col
    assert(px(4) == 1.0 && px(8) == 102.0) // (0,0) and (1,1)
  }

  test("tileBatch joins table annotations as labels") {
    val r = circleRegions(Seq((1L, 3.0, 3.0, 1.0), (2L, 8.0, 8.0, 1.0)))
    val obs = Seq((1L, "tumor"), (2L, "stroma")).toDF("instance_id", "cell_type")
    val got = ImageTiles.tileBatch(pixels, ImageTiles.tileCoords(r), cell = 4.0,
      obs = Some((obs, "instance_id", "cell_type")))
      .select("instance_id", "label").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "tumor"), (2L, "stroma")))
  }

  test("crop join is bucket-gated: no product join in the plan") {
    val r = circleRegions(Seq((1L, 3.0, 3.0, 2.0)))
    val plan = ImageTiles.cropTiles(pixels, ImageTiles.tileCoords(r), cell = 4.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"product join in:\n$plan")
  }
}
