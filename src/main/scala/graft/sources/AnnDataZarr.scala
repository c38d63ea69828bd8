package graft.sources

import graft.geom.{GMultiPolygon, GPolygon, WKB}
import graft.model._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Readers for REFERENCE-written zarr store elements the engine's own
  * writer does not produce: AnnData table groups
  * (`reference/src/spatialdata/_io/io_table.py:22-49` + the anndata zarr
  * on-disk encodings: `dataframe`, `categorical`, `csr_matrix`, dense X) and
  * ShapesFormatV01 ragged-array shapes
  * (`reference/src/spatialdata/_io/io_shapes.py:33-56`: `coords` +
  * `offset{i}` + `Index` + `radius` arrays in geoarrow ragged layout).
  *
  * Everything is chunk-parallel: the driver touches JSON metadata only, and
  * each task decodes its own chunks (same contract as [[NgffRaster]]). Row
  * alignment across 1-D columns is by explicit `row` index — never implicit
  * partition order. Variable-size structures (CSR rows, ragged rings) are
  * aligned with a bucketed interval join: offsets become `(group, start,
  * end)` ranges exploded into fixed-width position buckets, positions join
  * on their bucket, so no window, no cross join, no driver materialization.
  */
object AnnDataZarr {

  private val B = 8192L // positions per interval-join bucket

  /** Max obsm matrix width served through the wide-frame pivot. */
  val MaxObsmWidth = 64

  // ---- driver-side metadata helpers ----

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

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def arrayMeta(spark: SparkSession, dir: String): Zarr.ArrayMeta =
    Zarr.parseArrayMeta(readText(fs(spark, dir), s"$dir/.zarray"))

  private def groupAttrs(spark: SparkSession, dir: String): JValue = {
    val f = fs(spark, dir)
    if (f.exists(new Path(s"$dir/.zattrs"))) JsonMethods.parse(readText(f, s"$dir/.zattrs"))
    else JNothing
  }

  private def isArray(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(s"$dir/.zarray"))

  // ---- chunk-parallel vector / matrix readers ----

  private def readChunkBytes(f: org.apache.hadoop.fs.FileSystem, p: Path): Array[Byte] = {
    val in = f.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream(65536)
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
  }

  // chunk ids land directly in range partitions — a repartition here would
  // add a shuffle stage to EVERY zarr array read for no distribution gain
  private def chunkTasks(spark: SparkSession, nChunks: Int): DataFrame =
    spark.range(0, nChunks, 1,
      math.max(1, math.min(nChunks, spark.sparkContext.defaultParallelism)))
      .toDF("chunk")

  /** 1-D numeric array -> `(row LONG, value DOUBLE)`. Absent chunks emit
    * `fill_value` rows so alignment with sibling columns is preserved.
    */
  def readNumericVector(spark: SparkSession, dir: String): DataFrame = {
    val m = arrayMeta(spark, dir)
    require(m.shape.length == 1, s"$dir: expected a 1-D array, got shape ${m.shape}")
    require(m.filters.isEmpty, s"$dir: unsupported filters ${m.filters} for numeric array")
    val n = m.shape.head; val cl = m.chunks.head
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val rows = chunkTasks(spark, m.gridShape.head).rdd.mapPartitions { it =>
      val f = new Path(dir).getFileSystem(confB.value.value)
      it.flatMap { r =>
        val ci = r.getLong(0).toInt
        val valid = math.min(cl, n - ci * cl)
        val p = new Path(s"$dir/$ci")
        if (!f.exists(p))
          (0 until valid).iterator.map(j => Row(ci.toLong * cl + j, m.fillValue))
        else {
          val vals = Zarr.decodeChunk(readChunkBytes(f, p), m)
          (0 until valid).iterator.map(j => Row(ci.toLong * cl + j, vals(j)))
        }
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("row", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false))))
  }

  /** 1-D object array with the `vlen-utf8` filter -> `(row LONG, value STRING)`. */
  def readStringVector(spark: SparkSession, dir: String): DataFrame = {
    val m = arrayMeta(spark, dir)
    require(m.shape.length == 1, s"$dir: expected a 1-D array, got shape ${m.shape}")
    require(m.filters == Seq("vlen-utf8"),
      s"$dir: string arrays need the vlen-utf8 filter, got ${m.filters}")
    val n = m.shape.head; val cl = m.chunks.head
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val rows = chunkTasks(spark, m.gridShape.head).rdd.mapPartitions { it =>
      val f = new Path(dir).getFileSystem(confB.value.value)
      it.flatMap { r =>
        val ci = r.getLong(0).toInt
        val valid = math.min(cl, n - ci * cl)
        val p = new Path(s"$dir/$ci")
        if (!f.exists(p))
          (0 until valid).iterator.map(j => Row(ci.toLong * cl + j, null))
        else {
          val items = Zarr.vlenUtf8Decode(
            Zarr.decompressAny(readChunkBytes(f, p), m.compressor))
          require(items.length >= valid,
            s"$dir chunk $ci: ${items.length} items < $valid expected")
          (0 until valid).iterator.map(j => Row(ci.toLong * cl + j, items(j)))
        }
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("row", LongType, nullable = false),
      StructField("value", StringType, nullable = true))))
  }

  /** Dense 2-D array -> `(row LONG, col LONG, value DOUBLE)`. Absent chunks
    * are `fill_value`; fill rows are emitted only when `fill_value != 0`
    * (zero cells carry no information in the long form).
    */
  def readDenseMatrix(spark: SparkSession, dir: String): DataFrame = {
    val m = arrayMeta(spark, dir)
    require(m.shape.length == 2, s"$dir: expected a 2-D array, got shape ${m.shape}")
    val Seq(ny, nx) = m.shape.map(identity)
    val Seq(cy, cx) = m.chunks.map(identity)
    val Seq(gy, gx) = m.gridShape.map(identity)
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val rows = chunkTasks(spark, gy * gx).rdd.mapPartitions { it =>
      val f = new Path(dir).getFileSystem(confB.value.value)
      it.flatMap { r =>
        val ci = r.getLong(0).toInt
        val (ti, tj) = (ci / gx, ci % gx)
        val h = math.min(cy, ny - ti * cy)
        val w = math.min(cx, nx - tj * cx)
        val p = new Path(s"$dir/${m.chunkKey(Seq(ti, tj))}")
        if (!f.exists(p)) {
          if (m.fillValue == 0.0) Iterator.empty
          else for (y <- (0 until h).iterator; x <- (0 until w).iterator)
            yield Row(ti.toLong * cy + y, tj.toLong * cx + x, m.fillValue)
        } else {
          val vals = Zarr.decodeChunk(readChunkBytes(f, p), m)
          for (y <- (0 until h).iterator; x <- (0 until w).iterator)
            yield Row(ti.toLong * cy + y, tj.toLong * cx + x, vals(y * cx + x))
        }
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("row", LongType, nullable = false),
      StructField("col", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false))))
  }

  /** Bucketed interval join: assign each position in `positions.pos` to the
    * group `g` whose half-open range `[offsets[g], offsets[g+1])` contains
    * it. `offsets` is a `(row, value)` vector of length nGroups+1 (geoarrow /
    * CSR offset semantics). Ranges explode into `B`-wide buckets, positions
    * join on their single bucket — an equi-join, never a product.
    */
  private[sources] def assignByOffsets(positions: DataFrame, offsets: DataFrame,
      posCol: String = "pos"): DataFrame = {
    val starts = offsets.select(col("row").as("g"), col("value").cast("long").as("start"))
    val ends = offsets.filter(col("row") >= 1)
      .select((col("row") - 1).as("g"), col("value").cast("long").as("end"))
    val ranges = starts.join(ends, "g").filter(col("end") > col("start"))
    val buckets = ranges.withColumn("bucket",
      explode(sequence(floor(col("start") / B), floor((col("end") - 1) / B))))
    positions.withColumn("bucket", floor(col(posCol) / B))
      .join(buckets, "bucket")
      .filter(col(posCol) >= col("start") && col(posCol) < col("end"))
      .drop("bucket", "start", "end")
  }

  /** CSR group (`encoding-type: csr_matrix`, arrays data/indices/indptr) ->
    * `(row, col, value)` COO triples.
    */
  def readCsrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val data = readNumericVector(spark, s"$dir/data")
      .select(col("row").as("pos"), col("value"))
    val indices = readNumericVector(spark, s"$dir/indices")
      .select(col("row").as("pos"), col("value").cast("long").as("col"))
    val indptr = readNumericVector(spark, s"$dir/indptr")
    val nz = data.join(indices, "pos")
    assignByOffsets(nz, indptr)
      .select(col("g").as("row"), col("col"), col("value"))
  }

  /** CSC group (`encoding-type: csc_matrix`) -> `(row, col, value)` COO
    * triples. Same arrays as CSR with the offset semantics transposed:
    * `indptr` delimits columns, `indices` holds row indices — the bucketed
    * interval join generalizes unchanged, only the output roles swap.
    */
  def readCscMatrix(spark: SparkSession, dir: String): DataFrame = {
    val data = readNumericVector(spark, s"$dir/data")
      .select(col("row").as("pos"), col("value"))
    val indices = readNumericVector(spark, s"$dir/indices")
      .select(col("row").as("pos"), col("value").cast("long").as("__rowIdx"))
    val indptr = readNumericVector(spark, s"$dir/indptr")
    val nz = data.join(indices, "pos")
    assignByOffsets(nz, indptr)
      .select(col("__rowIdx").as("row"), col("g").as("col"), col("value"))
  }

  // ---- AnnData dataframe group (obs / var) ----

  /** One dataframe-group column -> `(row, <name>)`: numeric array (int kinds
    * -> LONG, float -> DOUBLE), vlen-utf8 string array, or a categorical
    * subgroup (codes joined to categories; code -1 -> null).
    */
  private def readColumn(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (isArray(spark, dir)) {
      val m = arrayMeta(spark, dir)
      if (m.dtype.endsWith("O")) readStringVector(spark, dir).withColumnRenamed("value", name)
      else {
        val v = readNumericVector(spark, dir)
        val kind = m.dtype.charAt(1)
        if (kind == 'b')
          v.select(col("row"), (col("value") =!= 0.0).as(name))
        else if (kind == 'i' || kind == 'u')
          v.select(col("row"), col("value").cast("long").as(name))
        else v.withColumnRenamed("value", name)
      }
    } else {
      implicit val fmt: Formats = DefaultFormats
      val attrs = groupAttrs(spark, dir)
      (attrs \ "encoding-type").extractOrElse[String]("") match {
        case "categorical" =>
          val codes = readNumericVector(spark, s"$dir/codes")
            .select(col("row"), col("value").cast("long").as("__code"))
          val catMeta = arrayMeta(spark, s"$dir/categories")
          val cats =
            if (catMeta.dtype.endsWith("O")) readStringVector(spark, s"$dir/categories")
            else readNumericVector(spark, s"$dir/categories")
          val catDf = cats.select(col("row").as("__code"), col("value").as(name))
          codes.join(catDf, Seq("__code"), "left").drop("__code")
        // pandas extension dtypes (Int64/boolean): `values` + `mask` arrays,
        // mask true = missing (anndata nullable encodings)
        case enc @ ("nullable-integer" | "nullable-boolean") =>
          val vals = readNumericVector(spark, s"$dir/values")
          val mask = readNumericVector(spark, s"$dir/mask")
            .select(col("row"), (col("value") =!= 0.0).as("__mask"))
          val typed =
            if (enc == "nullable-boolean") (col("value") =!= 0.0).cast("boolean")
            else col("value").cast("long")
          vals.join(mask, "row")
            .select(col("row"),
              when(col("__mask"), lit(null)).otherwise(typed).as(name))
        case other => sys.error(s"$dir: unsupported column encoding '$other'")
      }
    }
  }

  /** AnnData `dataframe` group -> one DataFrame with a `__row` alignment
    * column, the index column (under its stored name), and every
    * `column-order` column. Column count is small; each column is a
    * distributed `(row, value)` read equi-joined on `row`.
    */
  def readDataFrameGroup(spark: SparkSession, dir: String): DataFrame = {
    implicit val fmt: Formats = DefaultFormats
    val attrs = groupAttrs(spark, dir)
    val indexName = (attrs \ "_index").extractOrElse[String]("_index")
    val order = (attrs \ "column-order") match {
      case JArray(cs) => cs.map(_.extract[String])
      case _ => Nil
    }
    val first = readColumn(spark, s"$dir/$indexName", indexName)
    val joined = order.foldLeft(first) { (acc, c) =>
      acc.join(readColumn(spark, s"$dir/$c", c), "row")
    }
    joined.withColumnRenamed("row", "__row")
  }

  // ---- AnnData table group ----

  /** Read a reference-written AnnData table group into the engine's table
    * layout: obs columns + long-form X aux (`instance_id, region, var_name,
    * value`, nonzero entries only). Annotation keys come from the group
    * attrs written by `io_table.py:62-72` (`region`, `region_key`,
    * `instance_key`).
    */
  def readTable(spark: SparkSession, dir: String, name: String): SpatialElement = {
    implicit val fmt: Formats = DefaultFormats
    val attrs = groupAttrs(spark, dir)
    val regionKey = (attrs \ "region_key") match {
      case JString(s) => Some(s); case _ => None
    }
    val instanceKey = (attrs \ "instance_key") match {
      case JString(s) => Some(s); case _ => None
    }
    val regions = (attrs \ "region") match {
      case JString(s) => Seq(s)
      case JArray(rs) => rs.collect { case JString(s) => s }
      case _ => Nil
    }
    val ann = (regionKey, instanceKey) match {
      case (Some(rk), Some(ik)) if regions.nonEmpty => Some(TableAnnotation(regions, rk, ik))
      case _ => None
    }

    val obs = readDataFrameGroup(spark, s"$dir/obs")

    val xDir = s"$dir/X"
    val f = fs(spark, dir)
    // var is only needed to name X/layer columns; a table without matrices
    // (annotation obs only) may legitimately lack the var group
    def varNames: DataFrame = {
      val varAttrs = groupAttrs(spark, s"$dir/var")
      val varIndexName = (varAttrs \ "_index").extractOrElse[String]("_index")
      readColumn(spark, s"$dir/var/$varIndexName", "var_name")
        .select(col("row").as("col"), col("var_name").cast("string").as("var_name"))
    }
    // X and layers share the matrix encodings (dense array / csr / csc)
    def readMatrix(mDir: String): Option[DataFrame] =
      if (f.exists(new Path(s"$mDir/.zarray"))) Some(readDenseMatrix(spark, mDir))
      else if (f.exists(new Path(s"$mDir/.zgroup"))) {
        val enc = (groupAttrs(spark, mDir) \ "encoding-type").extractOrElse[String]("")
        enc match {
          case "csr_matrix" => Some(readCsrMatrix(spark, mDir))
          case "csc_matrix" => Some(readCscMatrix(spark, mDir))
          case other => sys.error(s"$mDir: unsupported matrix encoding '$other' " +
            "(dense, csr_matrix and csc_matrix are supported)")
        }
      } else None

    def longForm(x: DataFrame): DataFrame = {
      val instCol = instanceKey.filter(k => obs.columns.contains(k))
        .map(k => col(k)).getOrElse(col("__row"))
      val regCol = regionKey.filter(k => obs.columns.contains(k))
        .map(k => col(k).cast("string")).getOrElse(lit(null).cast("string"))
      val obsKeyed = obs.select(col("__row").as("row"),
        instCol.as("instance_id"), regCol.as("region"))
      x.filter(col("value") =!= 0.0)
        .join(obsKeyed, "row")
        .join(varNames, "col")
        .select(col("instance_id"), col("region"), col("var_name"), col("value"))
    }

    val xLong = readMatrix(xDir).map(longForm)

    // layers: per-name matrices with X's shape and encodings, exposed as
    // aux "layer:<name>" (the get_values table_layer surface,
    // relational_query.py:1078-1086)
    val layersDir = s"$dir/layers"
    val layerAux: Map[String, DataFrame] =
      if (!f.exists(new Path(s"$layersDir/.zgroup"))) Map.empty
      else f.listStatus(new Path(layersDir)).toSeq
        .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
        .map(_.getPath.getName).sorted
        .flatMap { name =>
          readMatrix(s"$layersDir/$name").map(m => s"layer:$name" -> longForm(m))
        }.toMap

    // obsm: per-key (n_obs x k) matrices -> wide aux DataFrames keyed
    // "obsm:<key>" with columns (instance_id, <key>_0 .. <key>_{k-1}) —
    // the get_values obsm resolution surface (relational_query.py:981-1109)
    val obsmDir = s"$dir/obsm"
    val obsmAux: Map[String, DataFrame] =
      if (!f.exists(new Path(s"$obsmDir/.zgroup"))) Map.empty
      else {
        val instCol = instanceKey.filter(k => obs.columns.contains(k))
          .map(k => col(k)).getOrElse(col("__row"))
        val obsKeyed = obs.select(col("__row").as("row"), instCol.as("instance_id"))
        f.listStatus(new Path(obsmDir)).toSeq
          .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
          .map(_.getPath.getName).sorted
          .filter(key => f.exists(new Path(s"$obsmDir/$key/.zarray")))
          .map { key =>
            val m = arrayMeta(spark, s"$obsmDir/$key")
            require(m.shape.length == 2, s"obsm/$key: expected a 2-D array")
            val k = m.shape(1)
            // narrow (spatial/PCA-sized) keys pivot with k conditional
            // aggregates; beyond MaxObsmWidth that expression tree gets
            // quadratic-ish to compile, so embedding-sized keys aggregate
            // once into a map and project k element_at lookups instead —
            // the reference reads stores with 100+-dim obsm fine, so a
            // width cap must not fail the table read
            val wide =
              if (k <= MaxObsmWidth)
                readDenseMatrix(spark, s"$obsmDir/$key")
                  .groupBy("row")
                  .agg((0 until k).map(j =>
                    max(when(col("col") === j, col("value"))).as(s"${key}_$j")).head,
                    (1 until k).map(j =>
                      max(when(col("col") === j, col("value"))).as(s"${key}_$j")): _*)
              else
                readDenseMatrix(spark, s"$obsmDir/$key")
                  .groupBy("row")
                  .agg(map_from_entries(collect_list(struct(col("col"), col("value"))))
                    .as("__m"))
                  .select(col("row") +: (0 until k).map(j =>
                    element_at(col("__m"), lit(j.toLong)).as(s"${key}_$j")): _*)
            // left-join from obsKeyed (all instances): a fully-absent chunk
            // row emits no long-form rows when fill_value==0, but the dense
            // array semantics resolve it to fill_value, not a missing row
            val filled = obsKeyed.join(wide, Seq("row"), "left")
            val cols = col("instance_id") +: (0 until k).map(j =>
              coalesce(col(s"${key}_$j"), lit(m.fillValue)).as(s"${key}_$j"))
            s"obsm:$key" -> filled.select(cols: _*)
          }.toMap
      }

    // obsp: per-key (n_obs x n_obs) pairwise matrices (neighbor/distance
    // graphs anndata stores here; the reference reads them through anndata,
    // io_table.py:22-49) -> long-form aux "obsp:<key>"
    // (instance_id_a, instance_id_b, value) with BOTH axes resolved
    // through the obs row index. Stored entries are kept as-is (the
    // sparsity pattern IS the graph — no zero-filter like X long form).
    val obspDir = s"$dir/obsp"
    val obspAux: Map[String, DataFrame] =
      if (!f.exists(new Path(s"$obspDir/.zgroup"))) Map.empty
      else {
        val instCol = instanceKey.filter(k => obs.columns.contains(k))
          .map(k => col(k)).getOrElse(col("__row"))
        val obsKeyed = obs.select(col("__row"), instCol.as("__inst"))
        f.listStatus(new Path(obspDir)).toSeq
          .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
          .map(_.getPath.getName).sorted
          .map { key =>
            val m = readMatrix(s"$obspDir/$key").getOrElse(
              sys.error(s"$obspDir/$key: expected a matrix group or array"))
            s"obsp:$key" -> m
              .join(obsKeyed.select(col("__row").as("row"),
                col("__inst").as("instance_id_a")), "row")
              .join(obsKeyed.select(col("__row").as("col"),
                col("__inst").as("instance_id_b")), "col")
              .select(col("instance_id_a"), col("instance_id_b"), col("value"))
          }.toMap
      }

    // varm: per-key (n_var x k) matrices (PCA loadings etc.) -> wide aux
    // "varm:<key>" (var_name, <key>_0 .. <key>_{k-1}); var-sized, so the
    // conditional-aggregate pivot is always safe
    val varmDir = s"$dir/varm"
    val varmAux: Map[String, DataFrame] =
      if (!f.exists(new Path(s"$varmDir/.zgroup"))) Map.empty
      else
        f.listStatus(new Path(varmDir)).toSeq
          .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
          .map(_.getPath.getName).sorted
          .filter(key => f.exists(new Path(s"$varmDir/$key/.zarray")))
          .map { key =>
            val m = arrayMeta(spark, s"$varmDir/$key")
            require(m.shape.length == 2, s"varm/$key: expected a 2-D array")
            val k = m.shape(1)
            val wide = readDenseMatrix(spark, s"$varmDir/$key")
              .groupBy("row")
              .agg((0 until k).map(j =>
                max(when(col("col") === j, col("value"))).as(s"${key}_$j")).head,
                (1 until k).map(j =>
                  max(when(col("col") === j, col("value"))).as(s"${key}_$j")): _*)
            // bind the def ONCE — a second varNames call would be a new plan
            // with fresh attribute ids, making the join condition ambiguous
            val vn = varNames.select(col("col").as("row"), col("var_name"))
            val named = vn.join(wide, Seq("row"), "left")
            val cols = col("var_name") +: (0 until k).map(j =>
              coalesce(col(s"${key}_$j"), lit(m.fillValue)).as(s"${key}_$j"))
            s"varm:$key" -> named.select(cols: _*)
          }.toMap

    SpatialElement(Models.TableModel.meta(name, ann),
      obs.drop("__row"), xLong.map("X" -> _).toMap ++ layerAux ++ obsmAux ++
        obspAux ++ varmAux)
  }

  // ---- ShapesFormatV01 ragged shapes ----

  /** `coords` array -> `(pos, x, y)`. Requires row-complete chunks
    * (`chunks = [k, 2]`), which is how 2-column coordinate arrays chunk in
    * practice; column-split chunking would need a pivot shuffle instead.
    */
  private def readCoords(spark: SparkSession, dir: String): DataFrame = {
    val m = arrayMeta(spark, dir)
    require(m.shape.length == 2 && m.shape(1) == 2 && m.chunks(1) == 2,
      s"$dir: ragged coords must be (n, 2) with row-complete chunks, " +
        s"got shape ${m.shape} chunks ${m.chunks}")
    readDenseMatrix(spark, dir)
      .groupBy(col("row").as("pos"))
      .agg(max(when(col("col") === 0, col("value"))).as("x"),
        max(when(col("col") === 1, col("value"))).as("y"))
  }

  /** Read a ShapesFormatV01 ragged-array shapes group
    * (io_shapes.py:42-56) into the canonical shapes layout. POINT + radius
    * becomes circles; POLYGON / MULTIPOLYGON are reassembled from geoarrow
    * offsets with bucketed interval joins and per-geometry WKB assembly
    * (bounded by single-geometry complexity, like [[graft.ops.Vectorize]]).
    */
  def readRaggedShapes(spark: SparkSession, dir: String): DataFrame = {
    implicit val fmt: Formats = DefaultFormats
    import spark.implicits._
    val attrs = groupAttrs(spark, dir)
    val geos = (attrs \ "spatialdata_attrs" \ "geos" \ "name").extract[String]
    val index = readNumericVector(spark, s"$dir/Index")
      .select(col("row").as("g"), col("value").cast("long").as("index"))

    geos match {
      case "POINT" =>
        val coords = readCoords(spark, s"$dir/coords")
          .select(col("pos").as("g"), col("x"), col("y"))
        val radius = readNumericVector(spark, s"$dir/radius")
          .select(col("row").as("g"), col("value").as("radius"))
        val df = index.join(coords, "g").join(radius, "g")
          .select(col("index"),
            graft.geom.st.st_point(col("x"), col("y")).as("geometry"),
            lit("circle").as("geom_type"), col("radius"))
        Models.ShapesModel.parse(df)

      case "POLYGON" | "MULTIPOLYGON" =>
        val multi = geos == "MULTIPOLYGON"
        val coords = readCoords(spark, s"$dir/coords")
        val ringOff = readNumericVector(spark, s"$dir/offset0")
        // coord position -> ring
        val inRing = assignByOffsets(coords, ringOff)
          .select(col("g").as("ring"), col("pos"), col("x"), col("y"))
        // flat closed ring coords, vertex order preserved via pos sort
        val rings = inRing.groupBy("ring")
          .agg(flatten(transform(
            sort_array(collect_list(struct(col("pos"), col("x"), col("y")))),
            e => array(e("x"), e("y")))).as("coords"))
        // ring -> polygon [-> geometry]
        val polyOff = readNumericVector(spark, s"$dir/offset1")
        val inPoly = assignByOffsets(rings.select(col("ring").as("pos"), col("coords")),
            polyOff)
          .select(col("g").as("poly"), col("pos").as("ring"), col("coords"))
        val parts =
          if (!multi) inPoly.select(col("poly").as("geom"), col("poly"), col("ring"), col("coords"))
          else {
            val geomOff = readNumericVector(spark, s"$dir/offset2")
            assignByOffsets(inPoly.select(col("poly").as("pos"), col("ring"), col("coords")),
                geomOff)
              .select(col("g").as("geom"), col("pos").as("poly"), col("ring"), col("coords"))
          }
        val assembled = parts.select(col("geom"), col("poly"), col("ring"), col("coords"))
          .as[(Long, Long, Long, Seq[Double])]
          .groupByKey(_._1)
          .mapGroups { (geomIdx, it) =>
            val polys = it.toArray.groupBy(_._2).toSeq.sortBy(_._1).map { case (_, rs) =>
              GPolygon(rs.sortBy(_._3).map(_._4.toArray).toArray)
            }.toArray
            val wkb =
              if (multi) WKB.write(GMultiPolygon(polys))
              else WKB.write(polys.head)
            (geomIdx, wkb)
          }
          .toDF("g", "geometry")
        val df = index.join(assembled, "g")
          .select(col("index"), col("geometry"),
            lit(if (multi) "multipolygon" else "polygon").as("geom_type"))
        Models.ShapesModel.parse(df)

      case other => sys.error(s"$dir: unsupported ragged geometry type '$other'")
    }
  }
}
