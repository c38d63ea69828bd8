package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.geom.st._

/** Schema parsers/validators per element kind — the Spark re-expression of
  * the reference's model classes (`models/models.py`): `parse()` normalizes
  * arbitrary input to the canonical layout, `validate()` re-checks
  * invariants. Validation that needs data (dtype, positivity, uniqueness) is
  * expressed as DataFrame predicates so it runs distributed, not on the
  * driver.
  */
object Models {

  // ---------- Points (PointsModel, models.py:667-945) ----------

  object PointsModel {
    val CoordTypes: Set[DataType] = Set(IntegerType, LongType, FloatType, DoubleType)

    /** Normalize coordinate columns to double, keep payload columns as-is.
      * `featureKey`/`instanceKey` recorded in the element meta, not the data
      * (models.py:909-945).
      */
    def parse(df: DataFrame, axes: Seq[String] = Seq("x", "y")): DataFrame = {
      axes.foreach { ax =>
        val f = df.schema.fields.find(_.name == ax)
          .getOrElse(sys.error(s"points missing coordinate column '$ax'"))
        require(CoordTypes.contains(f.dataType),
          s"coordinate '$ax' must be numeric (int32/64, float32/64), got ${f.dataType}")
      }
      axes.foldLeft(df)((d, ax) => d.withColumn(ax, col(ax).cast(DoubleType)))
    }

    def meta(name: String, axes: Seq[String] = Seq("x", "y"),
        featureKey: Option[String] = None, instanceKey: Option[String] = None,
        transforms: Map[String, Transform] = Map("global" -> IdentityT)): ElementMeta =
      ElementMeta(name, ElementKind.Points, axes, transforms,
        attrs = featureKey.map("feature_key" -> _).toMap ++
          instanceKey.map("instance_key" -> _).toMap)
  }

  // ---------- Shapes (ShapesModel, models.py:451-664) ----------

  object ShapesModel {
    val GeomCircle = "circle"
    val GeomPolygon = "polygon"
    val GeomMultiPolygon = "multipolygon"

    /** Drop Z/M ordinates from a raw WKB geometry column (`force_2d`,
      * reference models/_utils.py:311-345) — the doorway for 2.5D input;
      * the parsed layout is strictly 2D.
      */
    def force2d(df: DataFrame, geometryCol: String = "geometry"): DataFrame =
      df.withColumn(geometryCol, st_force_2d(col(geometryCol)))

    /** Rewrite a geoarrow-encoded geometry column (GeoParquet 1.1 native
      * encodings, the reference's `geometry_encoding="geoarrow"` write path,
      * io_shapes.py:100-150) to WKB: `struct<x,y>` points,
      * `list<list<struct<x,y>>>` polygons,
      * `list<list<list<struct<x,y>>>>` multipolygons. The WKB assembly is
      * a codegen'd `StaticInvoke` of [[ShapeKernel]] (house pattern — no
      * per-row ScalaUDF anywhere in the engine, so the ingest plans clean
      * under [[graft.functions.GraftGuardrails]] `fail` mode); the
      * struct→interleaved-doubles reshape stays in codegen'd
      * `transform`/`flatten`.
      */
    private def geoarrowToWkb(df: DataFrame, geometryCol: String): DataFrame = {
      def depth(t: DataType): Int = t match {
        case ArrayType(e, _) => 1 + depth(e)
        case _ => 0
      }
      // flatten each struct<x,y> ring into interleaved doubles with codegen'd
      // transforms, so the WKB-assembly kernel sees plain nested ArrayData
      val g = col(geometryCol)
      def ringFlat(ring: Column): Column =
        flatten(transform(ring, p => array(p("x"), p("y"))))
      val AD = ArrayType(DoubleType)
      val t = df.schema(geometryCol).dataType
      val converted = depth(t) match {
        case 0 =>
          shapeKernel("wkbPointXY", Seq(AD), array(g("x"), g("y")))
        case 2 =>
          shapeKernel("wkbPolygonRings", Seq(ArrayType(AD)),
            transform(g, ringFlat(_)))
        case 3 =>
          shapeKernel("wkbMultiPolygonParts", Seq(ArrayType(ArrayType(AD))),
            transform(g, poly => transform(poly, ringFlat(_))))
        case d => sys.error(s"unsupported geoarrow geometry nesting depth $d " +
          "(point, polygon and multipolygon encodings are supported)")
      }
      df.withColumn(geometryCol, converted)
    }

    private val SK: Class[_] = Class.forName("graft.model.ShapeKernel")

    /** Codegen'd WKB-assembly call ([[ShapeKernel]] static invoke). */
    private def shapeKernel(fn: String, inputTypes: Seq[DataType],
        args: Column*): Column =
      org.apache.spark.sql.graftbridge.Bridge.staticInvoke(
        SK, BinaryType, fn, args.toSeq, inputTypes, returnNullable = false)

    /** GeoParquet read path (reference io_shapes.py:33-67, format v02+:
      * `shapes.parquet` with a WKB or geoarrow geometry column): plain
      * parquet scan + Z-drop + geom_type derived from the WKB bytes; point
      * rows with a `radius` column are promoted to circles.
      */
    def readGeoParquet(spark: org.apache.spark.sql.SparkSession, path: String,
        geometryCol: String = "geometry", indexCol: Option[String] = None): DataFrame = {
      val scanned = spark.read.parquet(path)
      val asWkb = scanned.schema(geometryCol).dataType match {
        case BinaryType => scanned
        case _ => geoarrowToWkb(scanned, geometryCol)
      }
      val raw = force2d(asWkb, geometryCol)
      val kind = st_geom_type(col(geometryCol))
      val typed = raw.withColumn("geom_type",
        when(kind === "point" && (if (raw.columns.contains("radius"))
          col("radius").isNotNull else lit(false)), lit(GeomCircle))
          .otherwise(kind))
      parse(typed, geometryCol, indexCol = indexCol)
    }

    /** One GeoJSON geometry (or Feature) object -> 2D WKB, as a codegen'd
      * column over [[ShapeKernel.geoJsonToWkb]]. Z ordinates are dropped
      * (the reference's shapely parse + force_2d stance).
      */
    private def geoJsonWkbCol(json: Column): Column =
      shapeKernel("geoJsonToWkb", Seq(StringType), json)

    /** Shared tail of the GeoJSON ingest paths: WKB -> typed canonical
      * layout; Point geometries require `radius` (circles), as in the
      * reference's parse (models.py:640-643).
      */
    private def finishGeoJson(withWkb: DataFrame, radius: Option[Double]): DataFrame = {
      val kind = st_geom_type(col("geometry"))
      radius match {
        case Some(r) =>
          parse(withWkb.withColumn("geom_type",
            when(kind === "point", lit(GeomCircle)).otherwise(kind))
            .withColumn("radius",
              when(kind === "point", lit(r)).otherwise(lit(null).cast(DoubleType))))
        case None =>
          val nPoints = withWkb.filter(kind === "point").limit(1).count()
          require(nPoints == 0,
            "GeoJSON contains Point geometries: pass radius to parse circles " +
              "(reference ShapesModel.parse, models.py:640-643)")
          parse(withWkb.withColumn("geom_type", kind))
      }
    }

    /** GeoJSON ingest (the reference's `ShapesModel.parse(path)`,
      * models.py:624-649: shapely `from_geojson` -> GeometryCollection).
      * Accepts a GeometryCollection or FeatureCollection document. GeoJSON
      * is a single-document format, so the structural split happens on the
      * driver; per-geometry WKB assembly is distributed. For large inputs
      * prefer [[parseGeoJsonLines]] (one feature per line, fully
      * distributed) or GeoParquet.
      */
    def parseGeoJson(spark: org.apache.spark.sql.SparkSession, path: String,
        radius: Option[Double] = None): DataFrame = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      val text = try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](65536)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, "UTF-8")
      } finally in.close()
      val j = JsonMethods.parse(text)
      val geoms: Seq[String] = (j \ "type") match {
        case JString("GeometryCollection") =>
          (j \ "geometries").children.map(g => JsonMethods.compact(JsonMethods.render(g)))
        case JString("FeatureCollection") =>
          (j \ "features").children.map(f =>
            JsonMethods.compact(JsonMethods.render(f \ "geometry")))
        case other => sys.error(s"`$path` does not contain a GeometryCollection " +
          s"or FeatureCollection (got $other)")
      }
      import spark.implicits._
      val base = geoms.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("index", "__gj")
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("geometry", geoJsonWkbCol(col("__gj"))).drop("__gj")
      finishGeoJson(base, radius)
    }

    /** Newline-delimited GeoJSON (one Feature or geometry object per line):
      * a distributed text scan + per-line parse — the scale path for GeoJSON
      * ingest. Row index is the dense 0..n-1 line position (zipWithIndex —
      * one extra partition-count pass, no shuffle), matching the dense row
      * index tables key on; monotonically_increasing_id would emit sparse
      * partition-encoded ids that never line up with table instance ids.
      */
    def parseGeoJsonLines(spark: org.apache.spark.sql.SparkSession, path: String,
        radius: Option[Double] = None): DataFrame = {
      val indexed = spark.read.text(path)
        .filter(length(trim(col("value"))) > 0)
        .select("value").rdd.map(_.getString(0)).zipWithIndex()
      val lines = spark.createDataFrame(
        indexed.map { case (v, i) => org.apache.spark.sql.Row(i, v) },
        StructType(Seq(StructField("index", LongType, nullable = false),
          StructField("value", StringType, nullable = false))))
      finishGeoJson(lines.withColumn("geometry", geoJsonWkbCol(col("value")))
        .drop("value"), radius)
    }

    /** Canonical shapes layout: index, geometry (WKB), geom_type, radius
      * (circles only), plus precomputed envelope columns minx/miny/maxx/maxy
      * — the distributed stand-in for the reference's STRtree spatial index
      * (spatial_query.py:788): coarse range predicates on these columns are
      * parquet-statistics-prunable.
      */
    def parse(df: DataFrame, geometryCol: String = "geometry",
        radiusCol: Option[String] = None, indexCol: Option[String] = None): DataFrame = {
      require(df.schema.fields.exists(f => f.name == geometryCol && f.dataType == BinaryType),
        s"shapes need a binary WKB column '$geometryCol'")
      val withIdx = indexCol match {
        case Some(c) => df.withColumn("index", col(c).cast(LongType))
        case None if df.columns.contains("index") => df
        case None =>
          // dense 0..n-1 row ids (the reference GeoDataFrame's RangeIndex,
          // which annotation tables key on) — monotonically_increasing_id
          // would emit sparse partition-encoded ids that never line up;
          // same zipWithIndex trade as parseGeoJsonLines (one extra
          // partition-count pass, no shuffle)
          val rdd = df.rdd.zipWithIndex.map { case (r, i) =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
          }
          df.sparkSession.createDataFrame(rdd,
            StructType(df.schema.fields :+ StructField("index", LongType, nullable = false)))
      }
      val withRadius = radiusCol match {
        case Some(c) => withIdx.withColumn("radius", col(c).cast(DoubleType))
        case None if withIdx.columns.contains("radius") => withIdx
        case None => withIdx.withColumn("radius", lit(null).cast(DoubleType))
      }
      val g = col(geometryCol)
      withRadius
        .withColumn("minx", st_minx(g) - coalesce(col("radius"), lit(0.0)))
        .withColumn("miny", st_miny(g) - coalesce(col("radius"), lit(0.0)))
        .withColumn("maxx", st_maxx(g) + coalesce(col("radius"), lit(0.0)))
        .withColumn("maxy", st_maxy(g) + coalesce(col("radius"), lit(0.0)))
    }

    /** Invariant check (radius > 0 where circle; models.py:487-501):
      * returns offending rows; empty = valid. Mixed point/polygon elements
      * are forbidden (models.py:521-549).
      */
    def invalidRows(df: DataFrame): DataFrame =
      df.filter(col("geom_type") === GeomCircle &&
        (col("radius").isNull || col("radius") <= 0))

    def meta(name: String,
        transforms: Map[String, Transform] = Map("global" -> IdentityT)): ElementMeta =
      ElementMeta(name, ElementKind.Shapes, Seq("x", "y"), transforms)
  }

  // ---------- Labels (Labels2D/3DModel, models.py:409-440) ----------

  object LabelsModel {
    /** Long-form labels: [z,] y, x int32 + label int64; label 0 =
      * background and is dropped at parse (the reference keeps 0 in the
      * raster but every consumer skips it).
      */
    def parse(df: DataFrame, dims: Seq[String] = Seq("y", "x")): DataFrame = {
      val casted = dims.foldLeft(df)((d, ax) => d.withColumn(ax, col(ax).cast(IntegerType)))
        .withColumn("label", col("label").cast(LongType))
      casted
    }

    def meta(name: String, dims: Seq[String] = Seq("y", "x"),
        transforms: Map[String, Transform] = Map("global" -> IdentityT)): ElementMeta =
      ElementMeta(name, ElementKind.Labels, dims, transforms)
  }

  // ---------- Images (Image2D/3DModel, models.py:443-447) ----------

  object ImageModel {
    val TileSize = 256

    /** Tiled image schema: scale, c, tile_y, tile_x, h, w, px[h*w].
      * Multiscale pyramids are a `scale` column (SURVEY.md §1.5).
      */
    val schema: StructType = StructType(Seq(
      StructField("scale", IntegerType, nullable = false),
      StructField("c", IntegerType, nullable = false),
      StructField("tile_y", IntegerType, nullable = false),
      StructField("tile_x", IntegerType, nullable = false),
      StructField("h", IntegerType, nullable = false),
      StructField("w", IntegerType, nullable = false),
      StructField("px", ArrayType(DoubleType, containsNull = false), nullable = false)))

    def validateSchema(df: DataFrame): Unit = {
      val names = df.schema.fieldNames.toSet
      val missing = schema.fieldNames.filterNot(names.contains)
      require(missing.isEmpty, s"image tiles missing columns: ${missing.mkString(", ")}")
    }

    def meta(name: String, dims: Seq[String] = Seq("c", "y", "x"),
        channelNames: Seq[String] = Nil,
        transforms: Map[String, Transform] = Map("global" -> IdentityT)): ElementMeta =
      ElementMeta(name, ElementKind.Images, dims, transforms, channelNames)
  }

  // ---------- Tables (TableModel, models.py:948-1269) ----------

  object TableModel {
    /** obs must carry the region and instance columns named by the
      * annotation; (region, instance) pairs must be unique
      * (models.py:1250-1259). Returns duplicated pairs; empty = valid.
      */
    def duplicateAnnotations(obs: DataFrame, ann: TableAnnotation): DataFrame =
      obs.groupBy(col(ann.regionKey), col(ann.instanceKey))
        .count().filter(col("count") > 1)

    def parseObs(obs: DataFrame, ann: Option[TableAnnotation]): DataFrame = {
      ann.foreach { a =>
        require(obs.columns.contains(a.regionKey),
          s"obs missing region_key column '${a.regionKey}'")
        require(obs.columns.contains(a.instanceKey),
          s"obs missing instance_key column '${a.instanceKey}'")
        val t = obs.schema(a.instanceKey).dataType
        require(t == IntegerType || t == LongType || t == StringType,
          s"instance_key must be int or string, got $t (models.py:1091-1112)")
      }
      obs
    }

    /** Long-form X: one row per (instance, var) nonzero — sparse-friendly
      * (the reference's CSR X maps to COO triples, aggregate.py:474-482).
      */
    def xSchema(instanceType: DataType = LongType): StructType = StructType(Seq(
      StructField("instance_id", instanceType, nullable = false),
      StructField("region", StringType, nullable = true),
      StructField("var_name", StringType, nullable = false),
      StructField("value", DoubleType, nullable = false)))

    def meta(name: String, ann: Option[TableAnnotation],
        attrs: Map[String, String] = Map.empty): ElementMeta =
      ElementMeta(name, ElementKind.Tables, Nil, Map.empty, Nil, ann, attrs)
  }
}
