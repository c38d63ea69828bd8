package graft.model

import graft.geom.st._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic datasets (reference `datasets.py:37-101` blobs +
  * the benchmark generator `benchmarks/utils.py:284-351` cluster_blobs),
  * built from `spark.range` + hash-derived pseudo-randoms so they generate
  * identically at any scale and on any cluster — no driver-side RNG, no
  * materialization.
  */
object Datasets {

  /** Uniform [0,1) double derived from (seed, id, tag) — md5-based, stable
    * across engines and partitionings.
    */
  private def u(tag: String, id: org.apache.spark.sql.Column, seed: Int) =
    conv(substring(md5(concat_ws(":", lit(seed), lit(tag), id)), 1, 8), 16, 10)
      .cast("double") / 4294967296.0

  /** Blobs container: length x length image (one channel, gaussian bumps at
    * cell centers), labels (nearest-cell id within radius), n_cells circle
    * shapes, per-cell transcript points with a categorical gene key, and an
    * annotating table — the reference's `blobs`/`cluster_blobs` fixture
    * family as one SpatialDataset.
    */
  def blobs(spark: SparkSession, length: Int = 256, nCells: Int = 32,
      pointsPerCell: Int = 50, seed: Int = 42): SpatialDataset = {
    // cell centers
    val cells = spark.range(nCells.toLong).select(
      col("id").as("cell_id"),
      (u("cx", col("id"), seed) * length).as("cx"),
      (u("cy", col("id"), seed) * length).as("cy"),
      (u("r", col("id"), seed) * (length / 16.0) + length / 32.0).as("radius"))

    val shapes = Models.ShapesModel.parse(
      cells.select(col("cell_id").as("index"),
        st_point(col("cx"), col("cy")).as("geometry"),
        lit("circle").as("geom_type"), col("radius")),
      radiusCol = Some("radius"))

    // transcripts: per (cell, k) a point near the center
    val pts = spark.range(nCells.toLong * pointsPerCell).select(
      col("id").as("row_id"),
      (col("id") % nCells).as("cell_id"),
      ((u("px", col("id"), seed) - 0.5) * (length / 8.0)).as("dx"),
      ((u("py", col("id"), seed) - 0.5) * (length / 8.0)).as("dy"),
      concat(lit("gene_"), (col("id") % 26).cast("string")).as("genes"))
    val points = Models.PointsModel.parse(
      pts.join(cells.select(col("cell_id"), col("cx"), col("cy")), Seq("cell_id"))
        .select(col("row_id"), (col("cx") + col("dx")).as("x"),
          (col("cy") + col("dy")).as("y"), col("genes"),
          col("cell_id").cast("int").as("instance_id")))

    // labels: every pixel within a cell radius gets that cell id + 1
    val pixels = spark.range(length.toLong * length).select(
      (col("id") / length).cast("int").as("y"),
      (col("id") % length).cast("int").as("x"))
    val labels = Models.LabelsModel.parse(
      pixels.join(cells,
          (col("x") - col("cx")) * (col("x") - col("cx")) +
            (col("y") - col("cy")) * (col("y") - col("cy")) <=
            col("radius") * col("radius"), "left")
        .groupBy("y", "x")
        .agg(coalesce(min(col("cell_id") + 1), lit(0L)).as("label")))

    // image: distance-bump intensity (max over cells), tiled later if needed
    val image = pixels.join(cells,
        (col("x") - col("cx")) * (col("x") - col("cx")) +
          (col("y") - col("cy")) * (col("y") - col("cy")) <=
          col("radius") * col("radius") * 4.0, "left")
      .groupBy("y", "x")
      .agg(coalesce(max(
        lit(1.0) - sqrt((col("x") - col("cx")) * (col("x") - col("cx")) +
          (col("y") - col("cy")) * (col("y") - col("cy"))) / (col("radius") * 2.0)),
        lit(0.0)).as("value"))
      .withColumn("c", lit(0))

    val obs = cells.select(
      (col("cell_id") + 1).as("instance_id"),
      lit("blobs_labels").as("region"),
      (u("a", col("cell_id"), seed) * 10).as("a"))

    SpatialDataset(spark, Seq(
      SpatialElement(Models.ImageModel.meta("blobs_image", Seq("c", "y", "x")),
        RasterOps_pixelsToTiles(image)),
      SpatialElement(Models.LabelsModel.meta("blobs_labels"), labels),
      SpatialElement(Models.ShapesModel.meta("blobs_circles"), shapes),
      SpatialElement(Models.PointsModel.meta("blobs_points",
        featureKey = Some("genes"), instanceKey = Some("instance_id")), points),
      SpatialElement(Models.TableModel.meta("blobs_table",
        Some(TableAnnotation(Seq("blobs_labels"), "region", "instance_id"))), obs)))
  }

  /** Raccoon-style demo container (reference `datasets.py:77-101`): a
    * photo-sized 3-channel image, a ~`nSegments`-segment segmentation
    * labels element, and 4 fixed circles. The reference uses the scipy
    * raccoon photo + SLIC superpixels; with no image data bundled, the
    * engine generates a deterministic procedural texture (smooth channel
    * gradients + hash noise) and nearest-seed Voronoi segments — same
    * element structure, names, and circle coordinates/radii
    * (`datasets.py:96-97`), generated lazily from `spark.range` like
    * [[blobs]].
    */
  def raccoon(spark: SparkSession, height: Int = 768, width: Int = 1024,
      nSegments: Int = 100, seed: Int = 7): SpatialDataset = {
    import org.apache.spark.sql.functions.broadcast
    val pixels = spark.range(height.toLong * width).select(
      (col("id") / width).cast("int").as("y"),
      (col("id") % width).cast("int").as("x"))
    val pid = col("y").cast("long") * width + col("x")
    val image = pixels.select(col("y"), col("x"),
        posexplode(array(
          col("x").cast("double") / width * 0.6 + u("c0", pid, seed) * 0.4,
          col("y").cast("double") / height * 0.6 + u("c1", pid, seed) * 0.4,
          (col("x") + col("y")).cast("double") / (width + height) * 0.6 +
            u("c2", pid, seed) * 0.4))
          .as(Seq("c", "value")))
      .select(col("c").cast("int").as("c"), col("y"), col("x"), col("value"))

    // SLIC stand-in: nearest of nSegments hash-placed seeds (labels are
    // 1-based like blobs); struct-min argmin — broadcast seeds, partial
    // aggregation, no window
    val seeds = spark.range(nSegments.toLong).select(
      col("id").as("seg"),
      (u("sx", col("id"), seed) * width).as("sx"),
      (u("sy", col("id"), seed) * height).as("sy"))
    val d2 = (col("x") - col("sx")) * (col("x") - col("sx")) +
      (col("y") - col("sy")) * (col("y") - col("sy"))
    val labels = pixels.crossJoin(broadcast(seeds))
      .withColumn("__d", d2)
      .groupBy("y", "x")
      .agg(min(struct(col("__d"), col("seg"))).as("__best"))
      .select(col("y"), col("x"), (col("__best")("seg") + 1).as("label"))

    // the reference's fixed markers (datasets.py:96-97)
    val circleRows = Seq(
      (0L, 610.0, 450.0, 30.0), (1L, 730.0, 325.0, 30.0),
      (2L, 575.0, 300.0, 30.0), (3L, 480.0, 90.0, 50.0))
    import spark.implicits._
    val circles = Models.ShapesModel.parse(
      circleRows.toDF("index", "cx", "cy", "radius")
        .withColumn("geometry", graft.geom.st.st_point(col("cx"), col("cy")))
        .withColumn("geom_type", lit("circle")).drop("cx", "cy"),
      radiusCol = Some("radius"))

    SpatialDataset(spark, Seq(
      SpatialElement(Models.ImageModel.meta("raccoon", Seq("c", "y", "x")),
        RasterOps_pixelsToTiles(image)),
      SpatialElement(Models.LabelsModel.meta("segmentation"), labels),
      SpatialElement(Models.ShapesModel.meta("circles"), circles)))
  }

  // avoid a hard model->ops dependency: local alias
  private def RasterOps_pixelsToTiles(pixels: DataFrame): DataFrame =
    graft.ops.RasterOps.pixelsToTiles(pixels)
}
