package graft.sources

import graft.SparkTestBase
import graft.model._
import org.apache.spark.sql.functions._

/** Interop with REFERENCE-written zarr stores: the fixture at
  * `src/test/resources/refstore` is produced by `tools/make_ref_fixture.py`
  * (plain python, no JVM involvement) in the reference's on-disk layouts —
  * ShapesFormatV01 ragged arrays, ShapesFormatV02 GeoParquet, AnnData zarr
  * tables (dense + CSR X, categorical/string obs), reference-style points
  * and NGFF transform dicts with input/output coordinate-system objects.
  */
class RefStoreSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val root =
    new java.io.File("src/test/resources/refstore").getAbsolutePath
  private lazy val sd = ZarrStore.read(spark, root)

  test("container enumerates every reference-layout element") {
    assert(sd.manifest.elements.map(_.name).toSet ==
      Set("circles_v01", "polys_v01", "mpolys_v01", "gp_v02", "ga_v03",
        "t_dense", "t_csr", "t_csc", "pts_v01"))
  }

  test("ragged POINT + radius becomes circles, values exact") {
    val df = sd("circles_v01").orderBy("index")
    assert(df.count() == 40)
    val r = df.select("index", "radius").as[(Long, Double)].collect()
    assert(r.forall { case (i, rad) => rad == 1.0 + (i % 5) })
    val xy = df.select(graft.geom.st.st_centroid_x(col("geometry")),
      graft.geom.st.st_centroid_y(col("geometry"))).as[(Double, Double)].collect()
    xy.zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == (i * 7) % 50 + 0.5 && y == (i * 3) % 40 + 0.5)
    }
  }

  test("ragged POLYGON keeps holes: rect areas minus the poly-3 hole") {
    val a = sd("polys_v01")
      .select(col("index"), graft.geom.st.st_area(col("geometry")).as("a"))
      .as[(Long, Double)].collect().toMap
    assert(a.size == 30)
    (0 until 30).foreach { k =>
      val w = 3.0 + (k % 4); val h = 2.0 + (k % 3)
      val want = if (k == 3) w * h - 1.0 else w * h
      assert(a(k.toLong) == want, s"poly $k area ${a(k.toLong)} != $want")
    }
  }

  test("ragged MULTIPOLYGON with int32 offsets: two unit squares each") {
    val df = sd("mpolys_v01")
    assert(df.count() == 10)
    val areas = df.select(graft.geom.st.st_area(col("geometry")))
      .as[Double].collect()
    assert(areas.forall(_ == 2.0))
    assert(df.select("geom_type").distinct().as[String].collect().toSeq ==
      Seq("multipolygon"))
  }

  test("ShapesFormatV02 GeoParquet file reads with reference-style scale transform") {
    val el = sd.element("gp_v02")
    assert(el.data.count() == 20)
    val areas = el.data.select(graft.geom.st.st_area(col("geometry"))).as[Double].collect()
    assert(areas.forall(_ == 2.0))
    assert(el.meta.transforms("global") == ScaleT(Seq(2.0, 2.0), Seq("x", "y")))
  }

  test("geoarrow-encoded GeoParquet (ShapesFormatV03) converts to WKB") {
    val df = sd("ga_v03")
    assert(df.count() == 15)
    val rows = df.select(col("index"), graft.geom.st.st_area(col("geometry")),
      col("minx"), col("miny"), col("geom_type"))
      .as[(Long, Double, Double, Double, String)].collect().sortBy(_._1)
    rows.foreach { case (i, a, minx, miny, gt) =>
      assert(a == 3.0 && minx == i * 4.0 && miny == 2.0 * i && gt == "polygon")
    }
  }

  test("AnnData dense table: obs columns (categorical, string, numeric) align by row") {
    val el = sd.element("t_dense")
    val obs = el.obs.orderBy("instance_id")
    assert(obs.count() == 50)
    assert(obs.columns.toSet ==
      Set("_index", "region", "instance_id", "score", "grp", "flag"))
    val rows = obs.select("instance_id", "_index", "region", "score", "grp", "flag")
      .as[(Long, String, String, Double, String, Boolean)].collect()
    rows.foreach { case (i, idx, reg, score, grp, flag) =>
      assert(idx == s"cell_$i" && reg == "polys_v01" && score == i * 0.5 &&
        grp == Seq("a", "b", "c")(((i % 3).toInt)) && flag == (i % 2 == 0))
    }
    assert(el.meta.table.contains(TableAnnotation(Seq("polys_v01"), "region", "instance_id")))
  }

  test("AnnData dense X becomes nonzero long-form aligned to instance ids") {
    val x = sd.element("t_dense").x
    // X[i,j] = (i*4+j) % 7; zeros dropped
    val want = (for (i <- 0 until 50; j <- 0 until 4; v = (i * 4 + j) % 7 if v != 0)
      yield (i.toLong, s"g$j", v.toDouble)).toSet
    val got = x.select(col("instance_id").cast("long"), col("var_name"), col("value"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == want)
    assert(x.select("region").distinct().as[String].collect().toSeq == Seq("polys_v01"))
  }

  test("obsm matrix reads wide and resolves through get_values") {
    val el = sd.element("t_dense")
    assert(el.aux.contains("obsm:spatial"))
    val rows = el.aux("obsm:spatial")
      .select(col("instance_id").cast("long"), col("spatial_0"), col("spatial_1"))
      .as[(Long, Double, Double)].collect()
    assert(rows.length == 50)
    rows.foreach { case (i, a, b) => assert(a == i * 2.0 && b == i + 0.25) }
    val viaGet = graft.query.RelationalQuery.getValues(sd, "spatial", "polys_v01")
    assert(viaGet.columns.toSet == Set("instance_id", "spatial_0", "spatial_1"))
    assert(viaGet.count() == 50)
  }

  test("obsm rows in an ABSENT chunk resolve to fill_value, not missing rows") {
    val el = sd.element("t_dense")
    val rows = el.aux("obsm:pcs")
      .select(col("instance_id").cast("long"), col("pcs_0"), col("pcs_1"))
      .as[(Long, Double, Double)].collect()
    assert(rows.length == 50, "every instance must keep a row")
    rows.foreach { case (i, a, b) =>
      if (i >= 32 && i < 48) assert(a == 0.0 && b == 0.0, s"instance $i")
      else assert(a == i + 0.5 && b == i * 3.0, s"instance $i")
    }
  }

  test("obsm wider than MaxObsmWidth reads through the map-aggregate path " +
      "instead of failing the table read") {
    val el = sd.element("t_dense")
    assert(el.aux.contains("obsm:emb"))
    val df = el.aux("obsm:emb")
    assert(df.columns.length == 1 + 80)
    val rows = df.select(col("instance_id").cast("long"), col("emb_0"),
        col("emb_39"), col("emb_79"))
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.length == 50)
    rows.foreach { case (i, a, b, c) =>
      assert(a == i * 0.5 && b == i * 0.5 + 39 * 0.125 && c == i * 0.5 + 79 * 0.125)
    }
  }

  test("AnnData CSR X reconstructs exact COO triples") {
    val x = sd.element("t_csr").x
    val want = (for (i <- 0 until 30; e <- Seq((i % 3, i + 0.5), ((i + 1) % 3, 2.0 * i + 0.25)))
      yield (i.toLong, s"v${e._1}", e._2)).toSet
    val got = x.select(col("instance_id").cast("long"), col("var_name"), col("value"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == want)
  }

  test("AnnData CSC X reconstructs exact COO triples (column-offset semantics)") {
    val x = sd.element("t_csc").x
    // X[i,j] = (i + 2j) % 5; zeros dropped
    val want = (for (i <- 0 until 24; j <- 0 until 3; v = (i + 2 * j) % 5 if v != 0)
      yield (i.toLong, s"v$j", v.toDouble)).toSet
    val got = x.select(col("instance_id").cast("long"), col("var_name"), col("value"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == want)
  }

  test("nullable-integer/boolean obs columns (values+mask) keep true nulls") {
    val obs = sd.element("t_csc").obs
    assert(obs.schema("nn").dataType == org.apache.spark.sql.types.LongType)
    assert(obs.schema("nb").dataType == org.apache.spark.sql.types.BooleanType)
    val rows = obs.select(col("instance_id").cast("long"), col("nn"), col("nb"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getBoolean(2))))
    assert(rows.length == 24)
    rows.foreach { case (i, nn, nb) =>
      assert(nn == (if (i % 5 == 0) None else Some(i * 2)), s"nn at $i")
      assert(nb == (if (i % 7 == 0) None else Some(i % 2 == 1)), s"nb at $i")
    }
  }

  test("numpy bool obs columns read as BooleanType") {
    val obs = sd.element("t_csc").obs
    assert(obs.schema("ok").dataType == org.apache.spark.sql.types.BooleanType)
    val rows = obs.select(col("instance_id").cast("long"), col("ok"))
      .as[(Long, Boolean)].collect()
    assert(rows.length == 24)
    rows.foreach { case (i, ok) => assert(ok == (i % 3 == 0)) }
  }

  test("interop readers keep product-free plans (bucketed interval joins)") {
    for (df <- Seq(sd.element("t_csr").x, sd.element("t_csc").x,
        sd("polys_v01"), sd("mpolys_v01"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"CartesianProduct in:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"BroadcastNestedLoopJoin in:\n$plan")
    }
  }

  test("reference points element: parquet payload + instance_key in attrs") {
    val el = sd.element("pts_v01")
    assert(el.data.count() == 25)
    assert(el.meta.attrs.get("instance_key").contains("instance"))
    val s = el.data.agg(sum(col("x")), sum(col("y"))).as[(Double, Double)].collect().head
    assert(s._1 == 1.5 * (0 until 25).sum && s._2 == 0.5 * (0 until 25).sum)
  }

  test("reference-style NGFF dicts parse: identity with coordinate-system objects") {
    assert(sd.element("pts_v01").meta.transforms("global") == IdentityT)
    assert(sd.element("circles_v01").meta.transforms("global") == IdentityT)
  }
}
