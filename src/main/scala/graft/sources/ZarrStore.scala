package graft.sources

import graft.model._
import graft.ops.RasterOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** Container-level zarr store: the reference's primary on-disk layout
  * (`reference/src/spatialdata/_io/io_zarr.py:33-123` dispatch;
  * `spatialdata.py:1108-1203` write): one root group with per-kind
  * subgroups —
  *
  * {{{
  * root/.zgroup .zattrs            (spatialdata version attrs)
  *   images/<name>/                (OME-NGFF multiscale, NgffRaster)
  *   labels/<name>/                (OME-NGFF rank-2, image-label marker)
  *   points/<name>/points.parquet  (+ .zattrs transforms, io_points.py:34)
  *   shapes/<name>/shapes.parquet  (+ .zattrs transforms, io_shapes.py:58)
  *   tables/<name>/obs.parquet, X.parquet (+ .zattrs annotation keys)
  * }}}
  *
  * Divergences, both deliberate: parquet "files" are Spark parquet
  * directories (task-parallel IO at any scale; a single-file layout would
  * serialize through one writer), and tables are parquet obs + long-form X
  * rather than AnnData zarr (the engine's table layout, SURVEY.md §1.5).
  */
object ZarrStore {

  private def writeText(fs: org.apache.hadoop.fs.FileSystem, p: String, text: String): Unit = {
    val out = fs.create(new Path(p), true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  private def readText(fs: org.apache.hadoop.fs.FileSystem, p: String): String = {
    val in = fs.open(new Path(p))
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
  }

  private def elementAttrs(meta: ElementMeta): String = {
    var o: JObject =
      ("coordinateTransformations" -> meta.transforms.toSeq.sortBy(_._1)
        .map { case (cs, t) => NgffRaster.transformToNgff(cs, t) }) ~
        ("axes" -> meta.dims)
    meta.table.foreach { ann =>
      o = o ~ ("spatialdata_attrs" ->
        (("region" -> ann.region) ~ ("region_key" -> ann.regionKey) ~
          ("instance_key" -> ann.instanceKey)))
    }
    if (meta.channelNames.nonEmpty) o = o ~ ("channel_names" -> meta.channelNames)
    JsonMethods.pretty(JsonMethods.render(o))
  }

  private def parseElementAttrs(json: String, name: String, kind: ElementKind): ElementMeta = {
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    val dims = (j \ "axes") match {
      case JArray(a) => a.map(_.extract[String])
      case _ => Nil
    }
    val spatialAxes = if (dims.nonEmpty) dims.filterNot(_ == "c") else Seq("x", "y")
    val transforms = (j \ "coordinateTransformations") match {
      case JArray(ts) => ts.flatMap { t =>
        (t \ "output" \ "name") match {
          case JString(cs) => Some(cs -> NgffRaster.transformFromNgff(t, spatialAxes))
          case _ => None
        }
      }.toMap
      case _ => Map.empty[String, Transform]
    }
    // spatialdata_attrs carries different keys per kind and per writer:
    // the engine's tables keep region/region_key/instance_key; the
    // reference's points keep instance_key/feature_key + a format version
    // (io_points.py / PointsAttrsMixinV01) and its shapes keep geos/version.
    // Only a complete (region, region_key, instance_key) triple becomes a
    // TableAnnotation; scalar string keys land in freeform attrs.
    val sa = j \ "spatialdata_attrs"
    val regions = (sa \ "region") match {
      case JString(s) => Seq(s)
      case JArray(rs) => rs.collect { case JString(s) => s }
      case _ => Nil
    }
    val table = ((sa \ "region_key"), (sa \ "instance_key")) match {
      case (JString(rk), JString(ik)) if regions.nonEmpty =>
        Some(TableAnnotation(regions, rk, ik))
      case _ => None
    }
    val freeAttrs = Seq("instance_key", "feature_key").flatMap { k =>
      if (table.isEmpty) (sa \ k) match {
        case JString(v) => Some(k -> v)
        case _ => None
      } else None
    }.toMap
    val channels = (j \ "channel_names") match {
      case JArray(cs) => cs.map(_.extract[String])
      case _ => Nil
    }
    ElementMeta(name, kind, dims, transforms, channels, table, freeAttrs)
  }

  /** Build zarr consolidated metadata (`.zmetadata`): every JSON metadata
    * file under the store keyed by relative path — one read resolves the
    * whole layout on remote stores (the reference writes this too,
    * spatialdata.py:1478-1492).
    */
  private def writeConsolidated(fs: org.apache.hadoop.fs.FileSystem, root: String): Unit = {
    val entries = scala.collection.mutable.ListBuffer.empty[(String, JValue)]
    def walk(dir: Path, rel: String): Unit =
      fs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        val childRel = if (rel.isEmpty) name else s"$rel/$name"
        if (st.isDirectory) walk(st.getPath, childRel)
        else if (name == ".zgroup" || name == ".zattrs" || name == ".zarray")
          entries += childRel -> JsonMethods.parse(readText(fs, st.getPath.toString))
      }
    walk(new Path(root), "")
    val consolidated: JValue =
      ("zarr_consolidated_format" -> 1) ~
        ("metadata" -> JObject(entries.sortBy(_._1).toList.map {
          case (k, v) => JField(k, v) }))
    writeText(fs, s"$root/.zmetadata", JsonMethods.pretty(JsonMethods.render(consolidated)))
  }

  /** Write the container as a zarr store. Raster elements must be in the
    * engine layouts (images tiled, labels long-form `(y, x, label)`).
    */
  def write(sd: SpatialDataset, root: String,
      tileSize: Int = Models.ImageModel.TileSize): Unit = {
    import org.apache.spark.sql.functions._
    val rp = new Path(root)
    val fs = rp.getFileSystem(sd.spark.sparkContext.hadoopConfiguration)
    if (fs.exists(rp)) fs.delete(rp, true)
    fs.mkdirs(rp)
    writeText(fs, s"$root/.zgroup", """{"zarr_format": 2}""")
    writeText(fs, s"$root/.zattrs",
      """{"spatialdata_attrs": {"version": "0.1", "writer": "graft"}}""")
    ElementKind.all.foreach { kind =>
      if (sd.manifest.ofKind(kind).nonEmpty) {
        fs.mkdirs(new Path(s"$root/${kind.dirName}"))
        writeText(fs, s"$root/${kind.dirName}/.zgroup", """{"zarr_format": 2}""")
      }
    }
    sd.manifest.elements.foreach { meta =>
      val el = sd.element(meta.name)
      val dir = s"$root/${meta.kind.dirName}/${meta.name}"
      meta.kind match {
        case ElementKind.Images =>
          // images are already tiled — write with THEIR tile size, not the
          // store default (mismatched chunk extents corrupt the payload)
          val ts = el.data.agg(max(greatest(col("h"), col("w"))))
            .collect()(0).getInt(0)
          NgffRaster.write(el.data, dir, meta.name, ts,
            transforms = meta.transforms, channels = meta.channelNames)
        case ElementKind.Labels if meta.dims.contains("z") =>
          val tiles = RasterOps.pixelsToTiles3d(
            el.data.select(lit(0).as("c"), col("z"), col("y"), col("x"),
              col("label").cast("double").as("value")), tileSize)
          NgffRaster.write(tiles, dir, meta.name, tileSize,
            axes = Seq("z", "y", "x"), dtype = "<i8", transforms = meta.transforms,
            isLabels = true)
        case ElementKind.Labels =>
          val tiles = RasterOps.pixelsToTiles(
            el.data.select(lit(0).as("c"), col("y"), col("x"),
              col("label").cast("double").as("value")), tileSize)
          NgffRaster.write(tiles, dir, meta.name, tileSize,
            axes = Seq("y", "x"), dtype = "<i8", transforms = meta.transforms,
            isLabels = true)
        case ElementKind.Points =>
          el.data.write.mode("overwrite").option("compression", "zstd")
            .parquet(s"$dir/points.parquet")
          writeText(fs, s"$dir/.zattrs", elementAttrs(meta))
        case ElementKind.Shapes =>
          el.data.write.mode("overwrite").option("compression", "zstd")
            .parquet(s"$dir/shapes.parquet")
          writeText(fs, s"$dir/.zattrs", elementAttrs(meta))
        case ElementKind.Tables =>
          el.data.write.mode("overwrite").option("compression", "zstd")
            .parquet(s"$dir/obs.parquet")
          el.aux.get("X").foreach(_.write.mode("overwrite")
            .option("compression", "zstd").parquet(s"$dir/X.parquet"))
          writeText(fs, s"$dir/.zattrs", elementAttrs(meta))
      }
    }
    writeConsolidated(fs, root)
  }

  /** Read a zarr store back into a container; `selection` restricts to
    * named elements (partial read, io_zarr.py:33-83). Labels return to the
    * long-form layout (background/zero pixels are not materialized).
    * `onBadFiles = "warn"` skips elements whose metadata fails to parse
    * instead of failing the whole read (the reference's
    * `BadFileHandleMethod.WARN`, io_zarr.py:44-48); each skip is recorded
    * in the container's `read_warnings` attr as well as on stderr.
    *
    * Metadata (element discovery, `.zattrs`, NGFF `.zarray`) is served
    * from consolidated `.zmetadata` when the store has one — one metadata
    * round trip for the whole container, the property that matters on
    * high-latency remote stores.
    */
  def read(spark: SparkSession, root: String,
      selection: Option[Seq[String]] = None,
      onBadFiles: String = "error"): SpatialDataset = {
    require(onBadFiles == "error" || onBadFiles == "warn",
      s"onBadFiles must be 'error' or 'warn', got '$onBadFiles'")
    import org.apache.spark.sql.functions._
    val rp = new Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val view = ZarrMetaView.load(fs, root)
    val warnings = scala.collection.mutable.ListBuffer.empty[String]
    val wanted: String => Boolean = selection match {
      case Some(names) => names.toSet
      case None => _ => true
    }
    val elements = ElementKind.all.flatMap { kind =>
      view.childDirs(kind.dirName).filter(wanted).flatMap { name =>
          val dir = s"$root/${kind.dirName}/$name"
          val rel = s"${kind.dirName}/$name"
          val ngffReader = Some((p: String) => view.textOrFail(s"$rel/$p"))
          try Some(kind match {
            case ElementKind.Images =>
              val (tiles, nm) = NgffRaster.read(spark, dir, metaReader = ngffReader)
              // record the STORE's chunk extent as the element's tile size so
              // downstream tile->pixel decodes use it, not the global default
              val ts = nm.scales.head.meta.chunks(nm.axes.indexOf("y"))
              SpatialElement(ElementMeta(name, kind, nm.axes, nm.transforms,
                nm.channels, attrs = Map("tile_size" -> ts.toString)), tiles)
            case ElementKind.Labels =>
              val (tiles, nm) = NgffRaster.read(spark, dir, metaReader = ngffReader)
              // tile coordinates decode against the STORE's chunk size
              // (the y-axis chunk extent; leading c/z chunk extents are 1)
              val ts = nm.scales.head.meta.chunks(nm.axes.indexOf("y"))
              if (nm.axes.contains("z")) {
                val longForm = RasterOps.tilesToPixels3d(tiles, ts)
                  .filter(col("value") =!= 0.0)
                  .select(col("z"), col("y"), col("x"),
                    col("value").cast("long").as("label"))
                SpatialElement(ElementMeta(name, kind, Seq("z", "y", "x"),
                  nm.transforms), longForm)
              } else {
                val longForm = RasterOps.tilesToPixels(tiles, ts)
                  .filter(col("value") =!= 0.0)
                  .select(col("y"), col("x"), col("value").cast("long").as("label"))
                SpatialElement(ElementMeta(name, kind, Seq("y", "x"),
                  nm.transforms), longForm)
              }
            case ElementKind.Points =>
              val meta = parseElementAttrs(view.textOrFail(s"$rel/.zattrs"), name, kind)
              SpatialElement(meta, spark.read.parquet(s"$dir/points.parquet"))
            case ElementKind.Shapes =>
              val meta = parseElementAttrs(view.textOrFail(s"$rel/.zattrs"), name, kind)
              if (fs.exists(new Path(s"$dir/shapes.parquet"))) {
                // engine layout (parsed columns) or reference ShapesFormatV02+
                // GeoParquet (raw WKB / geoarrow). The engine marker is the
                // FULL set of parsed+envelope columns — a reference store
                // that happens to carry a user column named geom_type must
                // still go through the GeoParquet parse (Z-drop, circle
                // promotion, envelope derivation)
                val df = spark.read.parquet(s"$dir/shapes.parquet")
                val engineCols = Set("geom_type", "minx", "miny", "maxx", "maxy")
                if (engineCols.subsetOf(df.columns.toSet)) SpatialElement(meta, df)
                else SpatialElement(meta,
                  Models.ShapesModel.readGeoParquet(spark, s"$dir/shapes.parquet"))
              } else if (view.hasMeta(s"$rel/coords/.zarray")) {
                // reference ShapesFormatV01 ragged arrays (io_shapes.py:42-56)
                SpatialElement(meta, AnnDataZarr.readRaggedShapes(spark, dir))
              } else sys.error(s"shapes '$name': no shapes.parquet or ragged coords")
            case ElementKind.Tables =>
              if (fs.exists(new Path(s"$dir/obs.parquet"))) {
                // engine layout: obs + optional long-form X parquet
                val meta = parseElementAttrs(view.textOrFail(s"$rel/.zattrs"), name, kind)
                val aux =
                  if (fs.exists(new Path(s"$dir/X.parquet")))
                    Map("X" -> spark.read.parquet(s"$dir/X.parquet"))
                  else Map.empty[String, DataFrame]
                SpatialElement(meta, spark.read.parquet(s"$dir/obs.parquet"), aux)
              } else {
                // reference layout: AnnData zarr group (io_table.py:22-49)
                AnnDataZarr.readTable(spark, dir, name)
              }
          })
          catch {
            case e: Exception if onBadFiles == "warn" =>
              val msg = s"skipping corrupted element '$rel': ${e.getMessage}"
              System.err.println(s"[ZarrStore] $msg")
              warnings += msg
              None
          }
        }
    }
    val sd = SpatialDataset(spark, elements)
    // surface the per-element failures in the manifest (the reference's
    // handle_read_errors collects warnings the same way) so a caller can
    // inspect what a lenient read dropped without scraping stderr
    if (warnings.isEmpty) sd
    else sd.withAttr("read_warnings",
      org.json4s.JArray(warnings.toList.map(org.json4s.JString(_))))
  }
}
