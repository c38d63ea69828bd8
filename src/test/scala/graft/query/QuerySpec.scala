package graft.query

import graft.SparkTestBase
import graft.geom.{GPolygon, WKB}
import graft.model._
import org.apache.spark.sql.functions._

class RelationalQuerySpec extends SparkTestBase {
  import spark.implicits._

  private val ann = TableAnnotation(Seq("cells"), "region", "instance_id")
  private def elem = Seq((1L, "x1"), (2L, "x2"), (3L, "x3"), (4L, "x4"))
    .toDF("index", "payload")
  private def obs = Seq(
    (2L, "cells", 0.2), (3L, "cells", 0.3), (9L, "cells", 0.9), (4L, "other", 0.4))
    .toDF("instance_id", "region", "a")

  private def ids(df: org.apache.spark.sql.DataFrame, c: String) =
    df.select(col(c).cast("long")).as[Long].collect().toSet

  test("left: all element rows, table filtered") {
    val r = RelationalQuery.joinElementTable(elem, "index", "cells", obs, ann, "left")
    assert(ids(r.element.get, "index") == Set(1L, 2L, 3L, 4L))
    assert(ids(r.table.get, "instance_id") == Set(2L, 3L))
  }

  test("left_exclusive: unannotated element rows only") {
    val r = RelationalQuery.joinElementTable(elem, "index", "cells", obs, ann, "left_exclusive")
    assert(ids(r.element.get, "index") == Set(1L, 4L))
    assert(r.table.isEmpty)
  }

  test("inner: both sides filtered") {
    val r = RelationalQuery.joinElementTable(elem, "index", "cells", obs, ann, "inner")
    assert(ids(r.element.get, "index") == Set(2L, 3L))
    assert(ids(r.table.get, "instance_id") == Set(2L, 3L))
  }

  test("right: full region table, masked element") {
    val r = RelationalQuery.joinElementTable(elem, "index", "cells", obs, ann, "right")
    assert(ids(r.element.get, "index") == Set(2L, 3L))
    assert(ids(r.table.get, "instance_id") == Set(2L, 3L, 9L))
  }

  test("right_exclusive: table rows with no element match") {
    val r = RelationalQuery.joinElementTable(elem, "index", "cells", obs, ann, "right_exclusive")
    assert(r.element.isEmpty)
    assert(ids(r.table.get, "instance_id") == Set(9L))
  }

  test("matchTableToElement enriches element rows in element order") {
    val got = RelationalQuery.matchTableToElement(elem, "index", "cells", obs, ann)
      .orderBy("index").select("index", "a").collect()
    assert(got.map(r => (r.getLong(0), Option(r.get(1)))).toSeq == Seq(
      (1L, None), (2L, Some(0.2)), (3L, Some(0.3)), (4L, None)))
  }

  test("join flavors carry no forced broadcast hint (AQE chooses strategy)") {
    // A points element's distinct-id side can be 1e8+ ids at scale; a forced
    // broadcast there is a driver/executor OOM. The plan must leave strategy
    // choice to AQE.
    for (how <- Seq("left", "left_exclusive", "inner", "right", "right_exclusive")) {
      val r = RelationalQuery.joinElementTable(elem, "index", "cells", obs, ann, how)
      for (df <- r.element.toSeq ++ r.table.toSeq) {
        val plan = df.queryExecution.analyzed.toString
        assert(!plan.contains("ResolvedHint"), s"'$how' forces a join hint:\n$plan")
      }
    }
    val m = RelationalQuery.matchTableToElement(elem, "index", "cells", obs, ann)
    assert(!m.queryExecution.analyzed.toString.contains("ResolvedHint"))
    val masked = RelationalQuery.maskLabelsByInstances(
      Seq((0L, 1L)).toDF("pix", "label"), Seq(1L).toDF("id"))
    assert(!masked.queryExecution.analyzed.toString.contains("ResolvedHint"))
  }

  test("filterByTableQuery masks elements to surviving instances") {
    val sd = SpatialDataset(spark, Seq(
      SpatialElement(Models.ShapesModel.meta("cells"),
        Models.ShapesModel.parse(elem.withColumn("geometry",
          graft.geom.st.st_point(lit(0.0), lit(0.0)))
          .withColumn("geom_type", lit("circle"))
          .withColumn("radius", lit(1.0)))),
      SpatialElement(Models.TableModel.meta("tbl", Some(ann)), obs)))
    val out = RelationalQuery.filterByTableQuery(sd, "tbl", col("a") > 0.25)
    assert(ids(out("cells"), "index") == Set(3L))
    assert(ids(out.element("tbl").obs, "instance_id") == Set(3L, 9L, 4L))
  }
}

class SpatialQuerySpec extends SparkTestBase {
  import spark.implicits._

  private def rectWkb(x0: Double, y0: Double, x1: Double, y1: Double) =
    graft.geom.WKB.write(graft.geom.GPolygon(Array(
      Array(x0, y0, x1, y0, x1, y1, x0, y1))))

  test("polygonQueryShapes clip=true: clips, drops boundary-touchers") {
    val shapes = Models.ShapesModel.parse(Seq(
      (1L, rectWkb(0, 0, 2, 2)),   // half inside -> clipped to 1x2
      (2L, rectWkb(1, -3, 2, 0)),  // touches the clip boundary -> zero area, dropped
      (3L, rectWkb(5, 5, 6, 6)))   // disjoint -> filtered before clip
      .toDF("index", "geometry")
      .withColumn("geom_type", lit("polygon")))
    val clip = rectWkb(1, 0, 4, 4)
    val got = SpatialQuery.polygonQueryShapes(shapes, IdentityT, clip, clip = true)
    val rows = got.select(col("index"), graft.geom.st.st_area(col("geometry")),
      col("minx"), col("maxx")).as[(Long, Double, Double, Double)].collect()
    assert(rows.toSeq == Seq((1L, 2.0, 1.0, 2.0)),
      s"expected shape 1 clipped to 1x2 with recomputed envelope, got ${rows.toSeq}")
  }

  test("polygonQueryShapes clip=true: reflex clips produce exact partitioned " +
      "geometry; holed clips clip exactly too") {
    val shapes = Models.ShapesModel.parse(Seq(
      (1L, rectWkb(0, 0, 2, 2)),   // fully inside the L -> area 4
      (2L, rectWkb(1, 1, 3, 3)),   // straddles the notch -> [1,3]x[1,2] + [1,2]x[2,3] = 3
      (3L, rectWkb(3, 3, 5, 5)),   // only touches the notch corner region -> dropped
      (4L, rectWkb(5, 5, 6, 6)))   // disjoint -> filtered before clip
      .toDF("index", "geometry")
      .withColumn("geom_type", lit("polygon")))
    // L-shape: [0,4]x[0,2] U [0,2]x[0,4] (reflex vertex at (2,2))
    val reflex = graft.geom.WKB.write(graft.geom.GPolygon(Array(
      Array(0.0, 0, 4, 0, 4, 2, 2, 2, 2, 4, 0, 4))))
    val got = SpatialQuery.polygonQueryShapes(shapes, IdentityT, reflex, clip = true)
    val areas = got.select(col("index"), graft.geom.st.st_area(col("geometry")))
      .as[(Long, Double)].collect().toMap
    assert(areas == Map(1L -> 4.0, 2L -> 3.0), s"got $areas")
    // clipped output must agree with the independent intersection-area kernel
    val viaArea = shapes.select(col("index"),
      graft.geom.st.st_intersection_area(col("geometry"), lit(reflex)))
      .as[(Long, Double)].collect().toMap
    areas.foreach { case (i, a) => assert(a == viaArea(i), s"shape $i") }
    // holed clip polygon: the trapezoid-band decomposition clips exactly
    // (reference parity — shapely clips by arbitrary geometry,
    // spatial_query.py:958-963); agreement with the area kernel again
    val holed = graft.geom.WKB.write(graft.geom.GPolygon(Array(
      Array(0.0, 0, 4, 0, 4, 4, 0, 4),
      Array(1.0, 1, 1, 2, 2, 2, 2, 1))))
    val holedAreas = SpatialQuery.polygonQueryShapes(shapes, IdentityT, holed, clip = true)
      .select(col("index"), graft.geom.st.st_area(col("geometry")))
      .as[(Long, Double)].collect().toMap
    val holedViaArea = shapes.select(col("index"),
      graft.geom.st.st_intersection_area(col("geometry"), lit(holed)))
      .as[(Long, Double)].collect().toMap
    // shape 1 [0,2]^2 ∩ donut = 4 - hole(1) = 3; shape 2 [1,3]^2 ∩ = 4-1 = 3;
    // shape 3 [3,4]^2 corner = 1
    assert(holedAreas == Map(1L -> 3.0, 2L -> 3.0, 3L -> 1.0), s"got $holedAreas")
    holedAreas.foreach { case (i, a) => assert(a == holedViaArea(i), s"shape $i") }
  }

  private def pts = Seq(
    (0L, 1.0, 1.0), (1L, 3.0, 3.0), (2L, 5.0, 1.0), (3L, -2.0, -2.0))
    .toDF("id", "x", "y")

  private def got(df: org.apache.spark.sql.DataFrame) =
    df.select("id").as[Long].collect().toSet

  test("identity bbox is exclusive on both sides") {
    val r = SpatialQuery.boundingBoxPoints(pts, IdentityT,
      Seq("x", "y"), Seq(0.0, 0.0), Seq(3.0, 3.0))
    assert(got(r) == Set(0L)) // (3,3) excluded
  }

  test("negative-scale transform swaps interval bounds") {
    // target = -1 * intrinsic; box (-4,-4)..(0,0) in target = (0,0)..(4,4) intrinsic
    val t = ScaleT(Seq(-1.0, -1.0), Seq("x", "y"))
    val r = SpatialQuery.boundingBoxPoints(pts, t,
      Seq("x", "y"), Seq(-4.0, -4.0), Seq(0.0, 0.0))
    assert(got(r) == Set(0L, 1L))
  }

  test("rotation transform matches brute-force projection") {
    // 90° CCW rotation: target_x = -y, target_y = x; box in target space
    val rot = AffineT(Matrix(3, 3, Array(0, -1, 0, 1, 0, 0, 0, 0, 1)),
      Seq("x", "y"), Seq("x", "y"))
    val r = SpatialQuery.boundingBoxPoints(pts, rot,
      Seq("x", "y"), Seq(-4.0, 0.0), Seq(0.0, 4.0))
    // -y in (-4,0) => y in (0,4); x in (0,4)
    assert(got(r) == Set(0L, 1L))
  }

  test("polygon query on points with diagonal transform") {
    val poly = WKB.write(GPolygon(Array(Array(0.0, 0, 8, 0, 8, 8, 0, 8))))
    val t = ScaleT(Seq(2.0, 2.0), Seq("x", "y")) // doubles coordinates
    val r = SpatialQuery.polygonQueryPoints(pts, t, poly)
    // scaled points: (2,2),(6,6),(10,2),(-4,-4) -> inside: first two
    assert(got(r) == Set(0L, 1L))
  }

  test("shapes bbox query: coarse + exact, rotated box") {
    import graft.geom.st._
    val shp = Models.ShapesModel.parse(Seq(
      (0L, WKB.write(GPolygon(Array(Array(0.0, 0, 2, 0, 2, 2, 0, 2)))), "polygon"),
      (1L, WKB.write(GPolygon(Array(Array(10.0, 10, 12, 10, 12, 12, 10, 12)))), "polygon"))
      .toDF("index", "geometry", "geom_type"))
    val r0 = SpatialQuery.boundingBoxShapes(shp, IdentityT, Seq(1.0, 1.0), Seq(3.0, 3.0))
    assert(r0.select("index").as[Long].collect().toSet == Set(0L))
    // rotated cs: intrinsic box becomes a diamond; square 1 still excluded
    val rot = AffineT(Matrix(3, 3, Array(0, -1, 0, 1, 0, 0, 0, 0, 1)), Seq("x", "y"), Seq("x", "y"))
    val r1 = SpatialQuery.boundingBoxShapes(shp, rot, Seq(-3.0, 0.0), Seq(0.0, 3.0))
    assert(r1.select("index").as[Long].collect().toSet == Set(0L))
  }

  test("labels bbox uses inclusive integer bounds") {
    val lbl = Models.LabelsModel.parse(
      Seq((0, 0, 1L), (2, 2, 2L), (5, 5, 3L)).toDF("y", "x", "label"))
    val r = SpatialQuery.boundingBoxLabels(lbl, IdentityT, Seq("y", "x"),
      Seq(0.0, 0.0), Seq(2.0, 2.0))
    assert(r.select("label").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("image tile bbox crops EVERY pyramid level through its scale transform") {
    import org.apache.spark.sql.functions.{col, lit}
    // dense 64x64 grid, 3 levels (scales 0..2), tileSize 16
    val px = spark.range(64 * 64).select(
      (col("id") / 64).cast("int").as("y"), (col("id") % 64).cast("int").as("x"),
      (col("id") % 7).cast("double").as("value")).withColumn("c", lit(0))
    val pyr = graft.ops.RasterOps.buildPyramid(px, levels = 2)
    val tiles = (0 to 2).map { lvl =>
      graft.ops.RasterOps.pixelsToTiles(
        pyr.filter(col("scale") === lvl).drop("scale"), tileSize = 16, scale = lvl)
    }.reduce(_ unionByName _)
    val out = SpatialQuery.boundingBoxImageTiles(tiles, IdentityT,
      Seq(20.0, 20.0), Seq(40.0, 40.0), tileSize = 16)
      .select("scale", "tile_y", "tile_x")
      .as[(Int, Int, Int)].collect().toSet
    // scale 0: level-0 box [20,40] -> tiles 1..2 on both axes
    // scale 1: box halves to [10,20] over a 32x32 grid -> tiles 0..1
    // scale 2: box quarters to [5,10] over 16x16 -> tile 0 only
    val expected =
      (for (ty <- 1 to 2; tx <- 1 to 2) yield (0, ty, tx)).toSet ++
      (for (ty <- 0 to 1; tx <- 0 to 1) yield (1, ty, tx)).toSet ++
      Set((2, 0, 0))
    assert(out == expected, s"got $out")
    // a box outside the image keeps nothing at any scale
    assert(SpatialQuery.boundingBoxImageTiles(tiles, IdentityT,
      Seq(200.0, 200.0), Seq(300.0, 300.0), tileSize = 16).count() == 0)
  }

  test("polygon query on tiles: envelope default (reference), exact prunes corner tiles") {
    import org.apache.spark.sql.functions.{col, lit}
    val px = spark.range(64 * 64).select(
      (col("id") / 64).cast("int").as("y"), (col("id") % 64).cast("int").as("x"),
      (col("id") % 7).cast("double").as("value")).withColumn("c", lit(0))
    val pyr = graft.ops.RasterOps.buildPyramid(px, levels = 2)
    val tiles = (0 to 2).map { lvl =>
      graft.ops.RasterOps.pixelsToTiles(
        pyr.filter(col("scale") === lvl).drop("scale"), tileSize = 16, scale = lvl)
    }.reduce(_ unionByName _)
    // right triangle (20,10)-(44,10)-(20,42): envelope [20,44]x[10,42]; the
    // hypotenuse leaves the envelope's bottom-right corner region empty
    val tri = WKB.write(GPolygon(Array(Array(20.0, 10, 44, 10, 20, 42))))
    val envSet = SpatialQuery.polygonQueryImageTiles(tiles, IdentityT, tri,
      tileSize = 16).select("scale", "tile_y", "tile_x")
      .as[(Int, Int, Int)].collect().toSet
    val expectedEnv =
      (for (ty <- 0 to 2; tx <- 1 to 2) yield (0, ty, tx)).toSet ++
      (for (ty <- 0 to 1; tx <- 0 to 1) yield (1, ty, tx)).toSet ++
      Set((2, 0, 0))
    assert(envSet == expectedEnv, s"got $envSet")
    // exact mode drops exactly the tiles the triangle itself never touches:
    // level-0 (2,2) and level-1 (1,1) — beyond the hypotenuse (x<=27.5 at y=32)
    val exactSet = SpatialQuery.polygonQueryImageTiles(tiles, IdentityT, tri,
      tileSize = 16, exact = true).select("scale", "tile_y", "tile_x")
      .as[(Int, Int, Int)].collect().toSet
    assert(exactSet == expectedEnv -- Set((0, 2, 2), (1, 1, 1)), s"got $exactSet")
  }
}
