package graft.query

import graft.SparkTestBase
import graft.model._
import graft.ops.Aggregate
import org.apache.spark.sql.functions._

/** Parity for the four small public-API utilities the reference exports
  * (`spatialdata/__init__.py`): sanitize_table, are_extents_equal,
  * get_bounding_box_corners, match_element_to_table.
  */
class ApiParitySpec extends SparkTestBase {
  import spark.implicits._

  test("sanitizeTable renames obs/obsm/layer keys with case-insensitive counters") {
    val obs = Seq((1L, "a", 0.5)).toDF("instance_id", "@Bad/Name", "bad_name")
    val obsm = Seq((1L, 1.0, 2.0)).toDF("instance_id", "sp@t_0", "sp@t_1")
    val layer = Seq((1L, "r", "v0", 1.0)).toDF("instance_id", "region", "var_name", "value")
    val el = SpatialElement(Models.TableModel.meta("t", None), obs,
      Map("obsm:sp@t" -> obsm, "layer:my/layer" -> layer))
    val out = Validation.sanitizeTable(el)
    // non-alnum (incl '@') -> '_' (reference sanitize_name, _utils.py:82),
    // then case-insensitive collision with bad_name -> counter
    assert(out.obs.columns.toSeq == Seq("instance_id", "_Bad_Name", "bad_name"))
    assert(out.aux.keySet == Set("obsm:sp_t", "layer:my_layer"))
    // renamed obsm key keeps its wide columns aligned
    assert(out.aux("obsm:sp_t").columns.toSet ==
      Set("instance_id", "sp_t_0", "sp_t_1"))
    // collision path: two columns sanitizing to the same name get _1
    val clash = Seq((1L, "x", "y")).toDF("a/b", "a\\b", "c")
    val el2 = SpatialElement(Models.TableModel.meta("t2", None), clash, Map.empty)
    assert(Validation.sanitizeTable(el2).obs.columns.toSeq == Seq("a_b", "a_b_1", "c"))
  }

  test("sanitizeName matches the reference's character rules") {
    assert(Validation.sanitizeName("my@invalid#name") == "my_invalid_name")
    // the reference loop sheds ONE underscore per pass while the '__'
    // prefix remains (_utils.py:84-86) — its docstring example 'private'
    // disagrees with its own code, which yields '_private'
    assert(Validation.sanitizeName("__private") == "_private")
    assert(Validation.sanitizeName("____x") == "_x")
    assert(Validation.sanitizeName("") == "unnamed")
    assert(Validation.sanitizeName("..") == "unnamed")
    // the reserved pandas index name maps to 'index' for dataframe columns
    assert(Validation.sanitizeName("_index", isDataframeColumn = true) == "index")
    assert(Validation.sanitizeName("_index") == "_index")
  }

  test("sanitizeTable remaps the annotation linkage through the obs renamer") {
    val obs = Seq((1L, "r", 0.5)).toDF("instance@id", "region#key", "score")
    val el = SpatialElement(Models.TableModel.meta("t",
      Some(TableAnnotation(Seq("shp"), "region#key", "instance@id"))), obs, Map.empty)
    val out = Validation.sanitizeTable(el)
    assert(out.obs.columns.toSeq == Seq("instance_id", "region_key", "score"))
    assert(out.meta.table.contains(
      TableAnnotation(Seq("shp"), "region_key", "instance_id")))
  }

  test("areExtentsEqual compares per-bound within atol over matching axes") {
    val e0 = Seq((0.0, 0.0, 10.0, 8.0)).toDF("xmin", "ymin", "xmax", "ymax")
    val e1 = Seq((0.05, -0.05, 10.01, 8.0)).toDF("xmin", "ymin", "xmax", "ymax")
    val e2 = Seq((0.0, 0.0, 10.5, 8.0)).toDF("xmin", "ymin", "xmax", "ymax")
    val e3 = Seq((0.0, 10.0)).toDF("xmin", "xmax")
    assert(Aggregate.areExtentsEqual(e0, e1))
    assert(!Aggregate.areExtentsEqual(e0, e2))         // 0.5 > atol
    assert(Aggregate.areExtentsEqual(e0, e2, atol = 1.0))
    assert(!Aggregate.areExtentsEqual(e0, e3))         // different axes
  }

  test("boundingBoxCorners matches the reference's vertex order for 2D and 3D") {
    assert(SpatialQuery.boundingBoxCorners(Seq("x", "y"), Seq(0.0, 1.0), Seq(2.0, 3.0)) ==
      Seq(Seq(0.0, 1.0), Seq(0.0, 3.0), Seq(2.0, 3.0), Seq(2.0, 1.0)))
    val c3 = SpatialQuery.boundingBoxCorners(Seq("x", "y", "z"),
      Seq(0.0, 0.0, 0.0), Seq(1.0, 2.0, 3.0))
    assert(c3.length == 8 && c3.head == Seq(0.0, 0.0, 0.0) &&
      c3(1) == Seq(0.0, 0.0, 3.0) && c3(6) == Seq(1.0, 2.0, 3.0))
    intercept[IllegalArgumentException] {
      SpatialQuery.boundingBoxCorners(Seq("x"), Seq(0.0), Seq(1.0))
    }
  }

  test("matchElementToTable masks elements to table instances; labels rejected") {
    val shp = Models.ShapesModel.parse(Seq(
      (0L, graft.geom.WKB.write(graft.geom.GPoint(0, 0)), 1.0),
      (1L, graft.geom.WKB.write(graft.geom.GPoint(2, 2)), 1.0),
      (2L, graft.geom.WKB.write(graft.geom.GPoint(4, 4)), 1.0))
      .toDF("index", "geometry", "radius")
      .withColumn("geom_type", lit("circle")))
    val obs = Seq((0L, "cells", 0.1), (2L, "cells", 0.2), (7L, "cells", 0.3))
      .toDF("instance_id", "region", "score")
    val sd = SpatialDataset(spark, Seq(
      SpatialElement(Models.ShapesModel.meta("cells"), shp),
      SpatialElement(Models.TableModel.meta("tbl",
        Some(TableAnnotation(Seq("cells"), "region", "instance_id"))), obs)))
    val (els, table) = RelationalQuery.matchElementToTable(sd, Seq("cells"), "tbl")
    assert(els("cells").select("index").as[Long].collect().toSet == Set(0L, 2L))
    assert(table.count() == 3) // table kept whole (how="right")
    val lbl = SpatialElement(Models.LabelsModel.meta("lab"),
      Seq((0L, 0L, 1L)).toDF("y", "x", "label"))
    val sd2 = SpatialDataset(spark, sd.manifest.elements.map(m => sd.element(m.name)) :+ lbl)
    val e = intercept[RuntimeException] {
      RelationalQuery.matchElementToTable(sd2, Seq("lab"), "tbl")
    }
    assert(e.getMessage.contains("Labels"))
  }
}
