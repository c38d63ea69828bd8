package graft.ops

import graft.SparkTestBase
import graft.geom.st._
import graft.model.Models
import org.apache.spark.sql.functions._

class AggregateSpec extends SparkTestBase {
  import spark.implicits._

  private def pts = Seq.tabulate(200)(i =>
    (i.toLong, (i % 23).toDouble, (i % 17).toDouble, (i % 5).toDouble))
    .toDF("id", "x", "y", "v")

  private def shapes = Models.ShapesModel.parse(Seq(
    (0L, 2.0, 2.0, 3.0), (1L, 10.0, 8.0, 4.0), (2L, 20.0, 14.0, 2.5))
    .toDF("index", "cx", "cy", "radius")
    .withColumn("geometry", st_point(col("cx"), col("cy")))
    .withColumn("geom_type", lit("circle"))
    .drop("cx", "cy"), radiusCol = Some("radius"))

  test("grid join matches broadcast join exactly") {
    val a = SpatialJoin.pointsInShapesBroadcast(pts, shapes)
      .select("id", "region_id").as[(Long, Long)].collect().toSet
    val b = SpatialJoin.pointsInShapesGrid(pts, shapes, cell = 4.0)
      .select("id", "region_id").as[(Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("polygon shapes route through the ray-cast kernel in both strategies") {
    val polys = Models.ShapesModel.parse(Seq(
      (0L, graft.geom.WKB.write(graft.geom.GPolygon(Array(Array(0.0, 0, 8, 0, 8, 8, 0, 8)))), "polygon"),
      (1L, graft.geom.WKB.write(graft.geom.GPolygon(Array(Array(10.0, 2, 22, 2, 16, 16)))), "polygon"))
      .toDF("index", "geometry", "geom_type"))
    val a = SpatialJoin.pointsInShapesBroadcast(pts, polys)
      .select("id", "region_id").as[(Long, Long)].collect().toSet
    val b = SpatialJoin.pointsInShapesGrid(pts, polys, cell = 5.0)
      .select("id", "region_id").as[(Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("tilesByLabels explodes tiles to the right pixel coordinates") {
    // one 2x2-ish tile world: tileSize=2, tile (0,0) px [0,1,2,3] and tile (0,1) px [10,11,12,13]
    val tiles = Seq(
      (0, 0, 0, 0, 2, 2, Seq(0.0, 1.0, 2.0, 3.0)),
      (0, 0, 0, 1, 2, 2, Seq(10.0, 11.0, 12.0, 13.0)))
      .toDF("scale", "c", "tile_y", "tile_x", "h", "w", "px")
    // labels: label 1 covers y=0 row; label 2 covers y=1 row (x 0..3)
    val labels = Seq.tabulate(8)(i => (i / 4, i % 4, (i / 4 + 1).toLong))
      .toDF("y", "x", "label")
    val got = Aggregate.tilesByLabels(tiles, labels, "sum", tileSize = 2)
      .orderBy("label").select("label", "value").as[(Long, Double)].collect().toSeq
    // label 1 (y=0): tile0 px[0]=0 px[1]=1 + tile1 px[10,11] = 22; label 2 (y=1): 2+3+12+13 = 30
    assert(got == Seq((1L, 22.0), (2L, 30.0)))
  }

  test("fractions weighting sums to the value when regions tile the plane") {
    // two half-plane boxes tiling [0,4]x[0,4]; one value box [1,3]^2 split evenly
    val by = Models.ShapesModel.parse(Seq(
      (0L, 0.0, 0.0, 2.0, 4.0), (1L, 2.0, 0.0, 4.0, 4.0))
      .toDF("index", "x0", "y0", "x1", "y1")
      .withColumn("geometry", st_make_box(col("x0"), col("y0"), col("x1"), col("y1")))
      .withColumn("geom_type", lit("polygon")).drop("x0", "y0", "x1", "y1"))
    val values = Models.ShapesModel.parse(Seq((0L, 8.0))
      .toDF("index", "value")
      .withColumn("geometry", st_make_box(lit(1.0), lit(1.0), lit(3.0), lit(3.0)))
      .withColumn("geom_type", lit("polygon")))
    val got = Aggregate.shapesByShapes(by, values, "value", "sum", fractions = true)
      .orderBy("region_id").select("value").as[Double].collect().toSeq
    assert(got == Seq(4.0, 4.0))
  }

  test("fractions with NON-convex regions via the general intersection kernel") {
    // L-shaped region (area 12) + the complementary 2x2 notch tile [2,4]x[2,4]
    val lRing = Array(0.0, 0, 4, 0, 4, 2, 2, 2, 2, 4, 0, 4)
    val by = Models.ShapesModel.parse(Seq(
      (0L, graft.geom.WKB.write(graft.geom.GPolygon(Array(lRing))), "polygon"),
      (1L, graft.geom.WKB.write(graft.geom.GPolygon(
        Array(Array(2.0, 2, 4, 2, 4, 4, 2, 4)))), "polygon"))
      .toDF("index", "geometry", "geom_type"))
    // one value box [1,1]-[3,3] (area 4, value 8) straddling both regions:
    // L gets 3/4 of it, the notch tile 1/4
    val values = Models.ShapesModel.parse(Seq((0L, 8.0)).toDF("index", "value")
      .withColumn("geometry", st_make_box(lit(1.0), lit(1.0), lit(3.0), lit(3.0)))
      .withColumn("geom_type", lit("polygon")))
    val got = Aggregate.shapesByShapes(by, values, "value", "sum",
      fractions = true, assumeConvexBy = false)
      .orderBy("region_id").select("region_id", "value").as[(Long, Double)].collect().toSeq
    assert(got == Seq((0L, 6.0), (1L, 2.0))) // 8 * 3/4, 8 * 1/4
    // the convex-assuming kernel would get the L region wrong
    val convex = Aggregate.shapesByShapes(by, values, "value", "sum", fractions = true)
      .orderBy("region_id").select("value").as[Double].collect()
    assert(convex(0) != 6.0)
  }

  test("shapes-shapes grid join matches broadcast join for every cell size") {
    // 40 value boxes of assorted sizes against 12 by-regions; straddling,
    // containment, disjoint and shared-edge cases all present
    val by = Models.ShapesModel.parse(Seq.tabulate(12)(i =>
      (i.toLong, (i % 4) * 9.0, (i / 4) * 11.0))
      .toDF("index", "x0", "y0")
      .withColumn("geometry", st_make_box(col("x0"), col("y0"),
        col("x0") + 10.0, col("y0") + 12.0))
      .withColumn("geom_type", lit("polygon")).drop("x0", "y0"))
    val values = Models.ShapesModel.parse(Seq.tabulate(40)(i =>
      (i.toLong, (i * 3.7) % 30.0, (i * 2.3) % 28.0, 1.0 + i % 5, i * 1.5))
      .toDF("index", "x0", "y0", "w", "value")
      .withColumn("geometry", st_make_box(col("x0"), col("y0"),
        col("x0") + col("w"), col("y0") + col("w") * 0.8))
      .withColumn("geom_type", lit("polygon")).drop("x0", "y0", "w"))
    val broadcastPairs = SpatialJoin.shapesIntersectShapes(by, values, withIntersectionArea = true)
      .select("region_id", "value_id", "intersection_area")
      .as[(Long, Long, Double)].collect().toSet
    assert(broadcastPairs.nonEmpty)
    for (cell <- Seq(3.0, 8.0, 25.0)) {
      val gridPairs = SpatialJoin.shapesIntersectShapesGrid(by, values, cell,
        withIntersectionArea = true)
        .select("region_id", "value_id", "intersection_area")
        .as[(Long, Long, Double)].collect().toSet
      assert(gridPairs == broadcastPairs, s"cell=$cell mismatch")
    }
  }

  test("concatenate with suffixes renames the WHOLE table linkage; " +
      "concatenateTables merges same-named tables") {
    import graft.model._
    def mkSd(tag: String): SpatialDataset = {
      val shp = Models.ShapesModel.parse(Seq(
        (0L, graft.geom.WKB.write(graft.geom.GPoint(1, 1)), "circle", 1.0))
        .toDF("index", "geometry", "geom_type", "radius"))
      val obs = Seq((0L, "cells", s"v_$tag")).toDF("instance_id", "region", "grp")
      val x = Seq((0L, "cells", "g1", 2.0)).toDF("instance_id", "region", "var_name", "value")
      SpatialDataset(spark, Seq(
        SpatialElement(Models.ShapesModel.meta("cells"), shp),
        SpatialElement(Models.TableModel.meta("tbl",
          Some(TableAnnotation(Seq("cells"), "region", "instance_id"))), obs,
          Map("X" -> x))))
    }
    val out = Aggregate.concatenate(Seq(mkSd("a"), mkSd("b")),
      suffixes = Some(Seq("s1", "s2")))
    assert(out.manifest.elements.map(_.name).toSet ==
      Set("cells-s1", "cells-s2", "tbl-s1", "tbl-s2"))
    // annotation region, obs region values, X region values all renamed
    val t1 = out.element("tbl-s1")
    assert(t1.meta.table.get.region == Seq("cells-s1"))
    assert(t1.obs.select("region").as[String].collect().toSeq == Seq("cells-s1"))
    assert(t1.aux("X").select("region").as[String].collect().toSeq == Seq("cells-s1"))
    // coordinate systems gain the suffix unless merging on name
    assert(out.element("cells-s1").meta.transforms.keySet == Set("global-s1"))
    val merged = Aggregate.concatenate(Seq(mkSd("a"), mkSd("b")),
      suffixes = Some(Seq("s1", "s2")), concatenateTables = true,
      mergeCoordinateSystemsOnName = true)
    // same-named tables differ after suffixing, so both remain; without
    // suffixes they merge into ONE table annotating both
    assert(merged.element("cells-s1").meta.transforms.keySet == Set("global"))
    val noSfx = Aggregate.concatenate(
      Seq(mkSd("a").subset(Seq("tbl"), filterTables = false),
        mkSd("b").subset(Seq("tbl"), filterTables = false)),
      concatenateTables = true)
    assert(noSfx.manifest.elements.map(_.name) == Seq("tbl"))
    assert(noSfx.element("tbl").obs.count() == 2)
    // and without concatenateTables, duplicate names get _N counters
    val kept = Aggregate.concatenate(
      Seq(mkSd("a").subset(Seq("tbl"), filterTables = false),
        mkSd("b").subset(Seq("tbl"), filterTables = false)))
    assert(kept.manifest.elements.map(_.name).toSet == Set("tbl_0", "tbl_1"))
  }
}
