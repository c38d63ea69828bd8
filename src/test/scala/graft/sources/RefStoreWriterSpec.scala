package graft.sources

import graft.SparkTestBase
import graft.geom.st._
import graft.model._
import org.apache.spark.sql.functions._

/** Write-side reference interop: [[RefStoreWriter]] emits the reference's
  * own layouts (AnnData zarr tables, single-file GeoParquet shapes with geo
  * footer metadata, reference-style NGFF attrs) and [[ZarrStore.read]]'s
  * reference-layout dispatch reads them back — a full round trip THROUGH
  * the foreign format. `tools/check_ref_store.py` validates the same bytes
  * with an independent pure-python reader.
  */
class RefStoreWriterSpec extends SparkTestBase {
  import spark.implicits._

  private def buildContainer(): SpatialDataset = {
    val shp = Models.ShapesModel.parse(
      (0 until 12).map { i =>
        (i.toLong, graft.geom.WKB.write(graft.geom.GPolygon(Array(
          Array(i * 3.0, i.toDouble, i * 3.0 + 2, i.toDouble,
            i * 3.0 + 2, i + 1.0, i * 3.0, i + 1.0)))))
      }.toDF("index", "geometry").withColumn("geom_type", lit("polygon")))
    val obs = (0 until 12).map(i => (i.toLong, "shp", i * 0.5, s"g${i % 3}", i % 2 == 0))
      .toDF("instance_id", "region", "score", "grp", "flag")
    val x = (for (i <- 0 until 12; j <- 0 until 3; v = (i + j) % 5 if v != 0)
      yield (i.toLong, "shp", s"v$j", v.toDouble))
      .toDF("instance_id", "region", "var_name", "value")
    val lx = (for (i <- 0 until 12; j <- 0 until 3; v = (i + 2 * j) % 4 if v != 0)
      yield (i.toLong, "shp", s"v$j", v.toDouble))
      .toDF("instance_id", "region", "var_name", "value")
    val pts = Models.PointsModel.parse(
      (0 until 20).map(i => (i.toLong, i * 1.5, i * 0.25)).toDF("id", "x", "y"))
    val spatialWide = (0 until 12).map(i => (i.toLong, i * 2.0, i + 0.25))
      .toDF("instance_id", "spatial_0", "spatial_1")
    SpatialDataset(spark, Seq(
      SpatialElement(Models.ShapesModel.meta("shp",
        transforms = Map("global" -> ScaleT(Seq(2.0, 2.0), Seq("x", "y")))), shp),
      SpatialElement(Models.PointsModel.meta("pts", instanceKey = Some("id")), pts),
      SpatialElement(Models.TableModel.meta("tab",
        Some(TableAnnotation(Seq("shp"), "region", "instance_id"))), obs,
        Map("X" -> x, "layer:counts" -> lx, "obsm:spatial" -> spatialWide))))
  }

  // fixed location so tools/check_ref_store.py can validate the same bytes
  // with a pure-python reader after `sbt test`
  private lazy val root = {
    val r = new java.io.File("target/ref-demo.zarr").getAbsolutePath
    RefStoreWriter.write(buildContainer(), r)
    r
  }

  test("shapes write as ONE GeoParquet file with geo footer metadata") {
    val f = new java.io.File(s"$root/shapes/shp/shapes.parquet")
    assert(f.isFile, "shapes.parquet must be a single file, not a directory")
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    val geo = try reader.getFooter.getFileMetaData.getKeyValueMetaData.get("geo")
    finally reader.close()
    assert(geo != null && geo.contains("\"encoding\":\"WKB\"") &&
      geo.contains("Polygon"), s"geo metadata missing or wrong: $geo")
  }

  test("AnnData table group has the anndata/dataframe encodings on disk") {
    import org.json4s._
    def attrs(p: String) = org.json4s.jackson.JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8"))
    val g = attrs(s"$root/tables/tab/.zattrs")
    assert((g \ "encoding-type") == JString("anndata"))
    assert((g \ "region") == JString("shp"))
    assert((g \ "instance_key") == JString("instance_id"))
    val o = attrs(s"$root/tables/tab/obs/.zattrs")
    assert((o \ "encoding-type") == JString("dataframe"))
    assert((o \ "_index") == JString("_index"))
    // low-cardinality strings round-trip as the anndata categorical encoding
    assert(attrs(s"$root/tables/tab/obs/grp/.zattrs") \ "encoding-type" ==
      JString("categorical"))
    assert(new java.io.File(s"$root/tables/tab/obs/grp/codes/.zarray").isFile)
    assert(new java.io.File(s"$root/tables/tab/obs/grp/categories/.zarray").isFile)
    // booleans write as numpy '|b1'
    val fl = attrs(s"$root/tables/tab/obs/flag/.zarray")
    assert((fl \ "dtype") == JString("|b1"))
    assert(attrs(s"$root/tables/tab/X/.zattrs") \ "encoding-type" == JString("array"))
  }

  test("round trip through the reference layout: shapes + transform") {
    val back = ZarrStore.read(spark, root)
    val shp = back.element("shp")
    assert(shp.meta.transforms("global") == ScaleT(Seq(2.0, 2.0), Seq("x", "y")))
    val areas = shp.data.select(col("index"), st_area(col("geometry")))
      .as[(Long, Double)].collect().toMap
    assert(areas.size == 12 && areas.values.forall(_ == 2.0))
  }

  test("round trip through the reference layout: AnnData table + X") {
    val back = ZarrStore.read(spark, root)
    val tab = back.element("tab")
    assert(tab.meta.table.contains(TableAnnotation(Seq("shp"), "region", "instance_id")))
    val obs = tab.obs.select(col("instance_id").cast("long"), col("score"), col("grp"),
        col("flag"))
      .as[(Long, Double, String, Boolean)].collect().sortBy(_._1)
    assert(obs.length == 12)
    obs.foreach { case (i, s, g, f) =>
      assert(s == i * 0.5 && g == s"g${i % 3}" && f == (i % 2 == 0)) }
    val x = tab.x.select(col("instance_id").cast("long"), col("var_name"), col("value"))
      .as[(Long, String, Double)].collect().toSet
    val want = (for (i <- 0 until 12; j <- 0 until 3; v = (i + j) % 5 if v != 0)
      yield (i.toLong, s"v$j", v.toDouble)).toSet
    assert(x == want)
    // layers round-trip beside X and resolve through get_values(table_layer)
    val lw = (for (i <- 0 until 12; j <- 0 until 3; v = (i + 2 * j) % 4 if v != 0)
      yield (i.toLong, s"v$j", v.toDouble)).toSet
    val lg = tab.aux("layer:counts")
      .select(col("instance_id").cast("long"), col("var_name"), col("value"))
      .as[(Long, String, Double)].collect().toSet
    assert(lg == lw)
    val viaGet = graft.query.RelationalQuery.getValues(back, "v1", "shp",
      tableLayer = Some("counts"))
      .select(col("instance_id").cast("long"), col("v1"))
      .as[(Long, Double)].collect().toSet
    assert(viaGet == lw.collect { case (i, "v1", v) => (i, v) })
    val e = intercept[RuntimeException] {
      graft.query.RelationalQuery.getValues(back, "v1", "shp",
        tableLayer = Some("nope")).collect()
    }
    assert(e.getMessage.contains("Layer"))
    // but an obs-column key resolves through obs BEFORE the layer lookup —
    // the reference only raises its ValueError at var-origin resolution
    val obsVals = graft.query.RelationalQuery.getValues(back, "score", "shp",
      tableLayer = Some("nope"))
    assert(obsVals.count() == 12)
    // obsm matrices round-trip as (n x k) dense zarr arrays beside X —
    // dropping them would silently lose spatial/PCA coordinates
    val sp = tab.aux("obsm:spatial")
      .select(col("instance_id").cast("long"), col("spatial_0"), col("spatial_1"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(sp.length == 12)
    sp.foreach { case (i, a, b) => assert(a == i * 2.0 && b == i + 0.25) }
  }

  test("geoarrow encoding rejects mixed point+polygon elements on the driver") {
    val mixed = Models.ShapesModel.parse(Seq(
      (0L, graft.geom.WKB.write(graft.geom.GPoint(1.0, 1.0)), "circle", Some(1.0)),
      (1L, graft.geom.WKB.write(graft.geom.GPolygon(Array(
        Array(0.0, 0.0, 2.0, 0.0, 2.0, 1.0, 0.0, 1.0)))), "polygon", None))
      .toDF("index", "geometry", "geom_type", "radius")
      .withColumn("radius", col("radius").cast("double")))
    val sd = SpatialDataset(spark, Seq(
      SpatialElement(Models.ShapesModel.meta("mix"), mixed)))
    val r = new java.io.File("target/ref-demo-mixed.zarr").getAbsolutePath
    val e = intercept[RuntimeException] {
      RefStoreWriter.write(sd, r, geometryEncoding = "geoarrow")
    }
    assert(e.getMessage.contains("homogeneous"), e.getMessage)
    // failed on the driver: no part files were started
    assert(!new java.io.File(s"$r/shapes/mix/shapes.parquet").exists())
  }

  test("above the row threshold shapes export becomes a task-parallel " +
      "partitioned dataset, each part carrying the geo footer") {
    val r = new java.io.File("target/ref-demo-parts.zarr").getAbsolutePath
    RefStoreWriter.write(buildContainer(), r, maxSingleFileRows = 5)
    val d = new java.io.File(s"$r/shapes/shp/shapes.parquet")
    assert(d.isDirectory, "expected a partitioned dataset directory")
    val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parts.length > 1, s"expected >1 task-written part, got ${parts.length}")
    parts.foreach { p =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p.getAbsolutePath),
          spark.sparkContext.hadoopConfiguration))
      val geo = try reader.getFooter.getFileMetaData.getKeyValueMetaData.get("geo")
      finally reader.close()
      assert(geo != null && geo.contains("\"encoding\":\"WKB\""))
    }
    val back = ZarrStore.read(spark, r)
    val areas = back("shp").select(col("index"), st_area(col("geometry")))
      .as[(Long, Double)].collect().toMap
    assert(areas.size == 12 && areas.values.forall(_ == 2.0))
  }

  test("geometry_encoding=geoarrow writes nested list/struct geometry " +
      "(ShapesFormatV03) that round-trips through the geoarrow read path") {
    val r = new java.io.File("target/ref-demo-ga.zarr").getAbsolutePath
    RefStoreWriter.write(buildContainer(), r, geometryEncoding = "geoarrow")
    // physical layout is nested, not WKB binary
    val raw = spark.read.parquet(s"$r/shapes/shp/shapes.parquet")
    assert(raw.schema("geometry").dataType.isInstanceOf[
      org.apache.spark.sql.types.ArrayType])
    val back = ZarrStore.read(spark, r)
    val areas = back("shp").select(col("index"), st_area(col("geometry")))
      .as[(Long, Double)].collect().toMap
    assert(areas.size == 12 && areas.values.forall(_ == 2.0))
    import org.json4s._
    val attrs = org.json4s.jackson.JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        s"$r/shapes/shp/.zattrs")), "UTF-8"))
    assert((attrs \ "spatialdata_attrs" \ "version") == JString("0.3"))
  }

  test("round trip through the reference layout: points + attrs") {
    val back = ZarrStore.read(spark, root)
    val pts = back.element("pts")
    assert(pts.meta.attrs.get("instance_key").contains("id"))
    assert(pts.data.count() == 20)
    val s = pts.data.agg(sum("x")).as[Double].collect().head
    assert(s == 1.5 * (0 until 20).sum)
  }
}
