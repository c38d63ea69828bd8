package graft.ops

import graft.geom.st._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed spatial joins (the reference's geopandas `sjoin`/`overlay`
  * calls, spatial_query.py:907 and aggregate.py:424-432, re-expressed as
  * joins Catalyst can plan).
  *
  * Two strategies:
  *  - `broadcast`: shapes side is small (the overwhelmingly common case —
  *    regions are thousands, points are billions). Broadcast shapes with
  *    their envelope columns; the coarse bbox conjunct prunes pairs before
  *    the exact kernel predicate runs.
  *  - `grid`: both sides big. Bucket points by cell id (one cell per point)
  *    and shapes by every cell their envelope covers (explode), equi-join on
  *    the cell id (a plain shuffle hash join), then refine with the exact
  *    predicate. A (point, shape) pair meets in exactly one cell — the
  *    point's — so no dedup is needed.
  */
object SpatialJoin {

  /** Exact point-in-shape predicate: circles are arithmetic
    * ((x-cx)^2+(y-cy)^2 <= r^2 — fully codegen, no WKB parse), polygons use
    * the ray-cast kernel.
    */
  private def pointInShape(px: String, py: String): org.apache.spark.sql.Column = {
    val dx = col(px) - col("__cx")
    val dy = col(py) - col("__cy")
    when(col("geom_type") === "circle",
      dx * dx + dy * dy <= col("radius") * col("radius"))
      .otherwise(st_contains_point(col("geometry"), col(px), col(py)))
  }

  private def prepShapes(shapes: DataFrame): DataFrame =
    shapes.withColumn("__cx", st_centroid_x(col("geometry")))
      .withColumn("__cy", st_centroid_y(col("geometry")))

  /** Broadcast join: every point row paired with the shapes containing it.
    * Output: point columns + `region_id` (shape index).
    */
  def pointsInShapesBroadcast(points: DataFrame, shapes: DataFrame,
      px: String = "x", py: String = "y"): DataFrame = {
    val s = prepShapes(shapes)
      .select(col("index").as("region_id"), col("geometry"), col("geom_type"),
        col("radius"), col("minx"), col("miny"), col("maxx"), col("maxy"),
        col("__cx"), col("__cy"))
    val coarse = col(px) >= col("minx") && col(px) <= col("maxx") &&
      col(py) >= col("miny") && col(py) <= col("maxy")
    points.join(broadcast(s), coarse && pointInShape(px, py), "inner")
      .drop("geometry", "geom_type", "radius", "minx", "miny", "maxx", "maxy", "__cx", "__cy")
  }

  /** Grid-bucketed join for big-by-big: `cell` size should be ~the median
    * shape envelope so shapes replicate to O(1) cells.
    */
  def pointsInShapesGrid(points: DataFrame, shapes: DataFrame, cell: Double,
      px: String = "x", py: String = "y"): DataFrame = {
    val p = points
      .withColumn("__cellx", floor(col(px) / cell).cast("long"))
      .withColumn("__celly", floor(col(py) / cell).cast("long"))
    val s = prepShapes(shapes)
      .select(col("index").as("region_id"), col("geometry"), col("geom_type"),
        col("radius"), col("minx"), col("miny"), col("maxx"), col("maxy"),
        col("__cx"), col("__cy"))
      .withColumn("__cellx", explode(sequence(
        floor(col("minx") / cell).cast("long"), floor(col("maxx") / cell).cast("long"))))
      .withColumn("__celly", explode(sequence(
        floor(col("miny") / cell).cast("long"), floor(col("maxy") / cell).cast("long"))))
    p.join(s, Seq("__cellx", "__celly"), "inner")
      .filter(pointInShape(px, py))
      .drop("geometry", "geom_type", "radius", "minx", "miny", "maxx", "maxy",
        "__cx", "__cy", "__cellx", "__celly")
  }

  /** Shapes-by-shapes intersection pairs (gpd.overlay precursor,
    * aggregate.py:429-432): bbox-bucket equi-join + exact intersects.
    * `left` keeps its `index` as `region_id`; right keeps `index` as
    * `value_id`; optionally computes the intersection area (fractions).
    */
  def shapesIntersectShapes(by: DataFrame, values: DataFrame,
      withIntersectionArea: Boolean = false,
      assumeConvexBy: Boolean = true): DataFrame = {
    val l = prepLeft(by)
    val r = prepRight(values)
    val joined = r.join(broadcast(l),
      coarseOverlap && st_intersects(col("__lg"), col("__rg")), "inner")
    finishPairs(joined, withIntersectionArea, assumeConvexBy)
  }

  /** Grid-bucketed shapes-by-shapes for big-by-big (the fallback when the
    * `by` side is too large to broadcast — mirrors [[pointsInShapesGrid]]).
    * Both sides explode their envelopes onto grid cells and meet in a plain
    * shuffle equi-join on the cell id. A pair whose envelopes overlap meets
    * in EVERY cell both envelopes cover; it is kept only in the canonical
    * cell (the one holding the lower-left corner of the envelope
    * intersection), so no distinct/dedup shuffle is needed.
    */
  def shapesIntersectShapesGrid(by: DataFrame, values: DataFrame, cell: Double,
      withIntersectionArea: Boolean = false,
      assumeConvexBy: Boolean = true): DataFrame = {
    def cells(minC: org.apache.spark.sql.Column, maxC: org.apache.spark.sql.Column) =
      sequence(floor(minC / cell).cast("long"), floor(maxC / cell).cast("long"))
    val l = prepLeft(by)
      .withColumn("__cellx", explode(cells(col("__lminx"), col("__lmaxx"))))
      .withColumn("__celly", explode(cells(col("__lminy"), col("__lmaxy"))))
    // Spread the probe side when the file layout under-parallelizes it: a
    // single small parquet file scans as ONE task, and with the tiny `by`
    // side broadcast, the whole per-pair intersection kernel (the expensive
    // triangulated-area path for non-convex regions) then runs serially on
    // that task (measured: q71's 2.1 s single-task stage). Hash-partition on
    // the value id — deterministic, no round-robin pre-sort. At production
    // scale the scan already has >= cores splits and NO shuffle is added.
    val spark = values.sparkSession
    val want = spark.sparkContext.defaultParallelism
    val r0 = prepRight(values)
    val rSpread =
      if (r0.rdd.getNumPartitions * 4 <= want) r0.repartition(want, col("value_id"))
      else r0
    val r = rSpread
      .withColumn("__cellx", explode(cells(col("minx"), col("maxx"))))
      .withColumn("__celly", explode(cells(col("miny"), col("maxy"))))
    val canonical =
      col("__cellx") === floor(greatest(col("__lminx"), col("minx")) / cell).cast("long") &&
        col("__celly") === floor(greatest(col("__lminy"), col("miny")) / cell).cast("long")
    val joined = r.join(l, Seq("__cellx", "__celly"))
      .filter(coarseOverlap && canonical && st_intersects(col("__lg"), col("__rg")))
      .drop("__cellx", "__celly")
    finishPairs(joined, withIntersectionArea, assumeConvexBy)
  }

  private def prepLeft(by: DataFrame): DataFrame =
    by.select(col("index").as("region_id"),
      col("geometry").as("__lg"), col("minx").as("__lminx"), col("miny").as("__lminy"),
      col("maxx").as("__lmaxx"), col("maxy").as("__lmaxy"))

  // values side keeps its payload columns (the aggregation input)
  private def prepRight(values: DataFrame): DataFrame =
    values
      .withColumnRenamed("index", "value_id")
      .withColumnRenamed("geometry", "__rg")
      .drop("geom_type", "radius")

  private def coarseOverlap: org.apache.spark.sql.Column =
    col("__lminx") <= col("maxx") && col("minx") <= col("__lmaxx") &&
      col("__lminy") <= col("maxy") && col("miny") <= col("__lmaxy")

  private def finishPairs(joined: DataFrame, withIntersectionArea: Boolean,
      assumeConvexBy: Boolean = true): DataFrame = {
    val out = if (withIntersectionArea)
      joined.withColumn("intersection_area",
        // convex `by` regions take the single Sutherland-Hodgman pass;
        // general polygons go through the triangulated exact-area kernel
        if (assumeConvexBy) st_intersection_area_convex(col("__rg"), col("__lg"))
        else st_intersection_area(col("__rg"), col("__lg")))
        .withColumn("value_area", st_area(col("__rg")))
    else joined
    out.drop("__lg", "__rg", "__lminx", "__lminy", "__lmaxx", "__lmaxy",
      "minx", "miny", "maxx", "maxy")
  }

  // ---------------------------------------------------------------- KNN join

  /** Bounded-radius k-nearest-neighbor join: for every query point, the k
    * nearest corpus points with squared distance <= radius², ranked by
    * (dist2, point id) so ties are deterministic. This is the spatial twin
    * of the ANN top-k family — "nearest cells/transcripts to each probe" —
    * and the standard distance-join-then-top-k form every distributed
    * spatial engine lowers KNN to (a true unbounded KNN needs an expanding
    * search; at pipeline scale the caller always has a physically-motivated
    * radius, e.g. a cell diameter).
    *
    * `dist2` stays in exact IEEE algebra ((qx-px)² + (qy-py)² — products
    * and sums of doubles are correctly rounded), so two engines rank
    * identically; no sqrt is taken (sqrt is monotone, ranking needs only
    * dist2, and emitting the square keeps the oracle exact).
    *
    * Broadcast path: the query side is small (probes), the corpus is one
    * pruned scan + a per-query window bounded by density·πr² candidates.
    */
  def knnWithinRadiusBroadcast(queries: DataFrame, points: DataFrame,
      k: Int, radius: Double,
      qid: String = "qid", qx: String = "qx", qy: String = "qy",
      pid: String = "pid", px: String = "x", py: String = "y"): DataFrame = {
    require(k >= 1, s"knnWithinRadius: k must be >= 1, got $k")
    require(radius > 0, s"knnWithinRadius: radius must be > 0, got $radius")
    val q = queries.select(col(qid), col(qx), col(qy))
    val coarse = col(px) >= col(qx) - radius && col(px) <= col(qx) + radius &&
      col(py) >= col(qy) - radius && col(py) <= col(qy) + radius
    rankCandidates(points.join(broadcast(q), coarse, "inner"),
      k, radius, qid, qx, qy, pid, px, py)
  }

  /** Grid form of [[knnWithinRadiusBroadcast]] for big-by-big: cell size =
    * radius, the QUERY side explodes to its 3x3 neighbor cells, corpus
    * points stay in exactly their own cell — a candidate pair meets once
    * (in the point's cell), so no dedup pass is needed and the join is a
    * plain shuffle equi-join on the cell id. Any point within `radius` of
    * a query is inside the query's 3x3 stencil, so recall is exact.
    */
  def knnWithinRadiusGrid(queries: DataFrame, points: DataFrame,
      k: Int, radius: Double,
      qid: String = "qid", qx: String = "qx", qy: String = "qy",
      pid: String = "pid", px: String = "x", py: String = "y"): DataFrame = {
    require(k >= 1, s"knnWithinRadius: k must be >= 1, got $k")
    require(radius > 0, s"knnWithinRadius: radius must be > 0, got $radius")
    val q = queries.select(col(qid), col(qx), col(qy))
      .withColumn("__cellx", explode(sequence(
        floor(col(qx) / radius).cast("long") - 1,
        floor(col(qx) / radius).cast("long") + 1)))
      .withColumn("__celly", explode(sequence(
        floor(col(qy) / radius).cast("long") - 1,
        floor(col(qy) / radius).cast("long") + 1)))
    val p = points
      .withColumn("__cellx", floor(col(px) / radius).cast("long"))
      .withColumn("__celly", floor(col(py) / radius).cast("long"))
    rankCandidates(p.join(q, Seq("__cellx", "__celly"), "inner")
        .drop("__cellx", "__celly"),
      k, radius, qid, qx, qy, pid, px, py)
  }

  /** KNN over a Z-ORDERED at-rest layout ([[ZOrder.writeZOrdered]]): the
    * probes' r-stencil boxes become covering Morton key bands (merged
    * across probes, pushed to the parquet row-group stats), then the
    * broadcast refine ranks exactly — row-identical to
    * [[knnWithinRadiusGrid]] over the raw table, but the scan touches only
    * the files whose key bands intersect a probe neighborhood. The probe
    * set is collected for range planning (probes are a query workload,
    * not a corpus — the same O(queries) handoff as the multi-box reads).
    */
  def knnWithinRadiusZ(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, radius: Double, level: Int = 8,
      qid: String = "qid", qx: String = "qx", qy: String = "qy",
      pid: String = "pid"): DataFrame = {
    require(radius > 0, s"knnWithinRadiusZ: radius must be > 0, got $radius")
    val m = ZOrder.readMeta(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"knnWithinRadiusZ: no _zorder_meta under $path"))
    val probes = queries.select(col(qx).cast("double"), col(qy).cast("double"))
      .collect()
    val boxes = probes.map { r =>
      (r.getDouble(0) - radius, r.getDouble(0) + radius,
        r.getDouble(1) - radius, r.getDouble(1) + radius)
    }.toSeq
    val pruned = ZOrder.coarseBoxPrune(spark, path, boxes,
        m.xmin, m.xmax, m.ymin, m.ymax, m.bits, level, m.keyCol)
      .drop(m.keyCol)
    knnWithinRadiusBroadcast(queries, pruned, k, radius,
      qid, qx, qy, pid, m.xCol, m.yCol)
  }

  /** Inverse-distance-weighted interpolation (Shepard 1968) — the
    * scattered-data → probe-grid estimator (gene-expression smoothing at
    * probe locations, sensor-field resampling): each query point's
    * estimate is Σ v_i/d²_i / Σ 1/d²_i over its k nearest samples within
    * `radius` (power-2 Shepard: the weight is 1/dist2, an EXACT IEEE
    * division of the exact squared distance). A sample at the probe
    * location itself (dist2 = 0) short-circuits to that sample's value —
    * the standard convention, and the guard that keeps 1/d² finite.
    * Weights and weighted values snap to the 1e-6 grid and sum as exact
    * decimals, so the estimate is engine-reproducible at any parallelism.
    *
    * Shape at scale: candidate generation IS [[knnWithinRadiusGrid]]
    * (cell-stencil equi-join, no product), values join back pid-keyed,
    * and the estimate is one keyed aggregation. Probes with no sample in
    * radius are absent from the output (nothing to estimate from).
    * `pid` MUST be unique in `points` — a duplicate id fans out the
    * value join and double-counts its weight (dedupe upstream; checking
    * here would cost a full extra pass). Output: (qid, n_neighbors, idw).
    */
  def idwInterpolate(queries: DataFrame, points: DataFrame,
      k: Int, radius: Double,
      qid: String = "qid", qx: String = "qx", qy: String = "qy",
      pid: String = "pid", px: String = "x", py: String = "y",
      valueCol: String = "v"): DataFrame = {
    import graft.pipeline.TextAnalysis.round6
    val nn = knnWithinRadiusGrid(queries,
      points.select(col(pid), col(px), col(py)), k, radius,
      qid, qx, qy, pid, px, py)
    val withV = nn.join(
      points.select(col(pid), col(valueCol).cast("double").as("__v")), pid)
    withV.groupBy(col(qid))
      .agg(count(lit(1)).as("n_neighbors"),
        min(col("dist2")).as("__d0"),
        min_by(col("__v"), struct(col("dist2"), col(pid))).as("__vnear"),
        sum(when(col("dist2") > 0, round6(col("__v") / col("dist2")))
          .otherwise(lit(0.0)).cast("decimal(38,6)")).cast("double").as("__num"),
        sum(when(col("dist2") > 0, round6(lit(1.0) / col("dist2")))
          .otherwise(lit(0.0)).cast("decimal(38,6)")).cast("double").as("__den"))
      .select(col(qid), col("n_neighbors"),
        when(col("__d0") === 0.0, col("__vnear"))
          .otherwise(round6(col("__num") / col("__den"))).as("idw"))
  }

  /** Shared refine + rank: exact radius filter, then a per-QUERY window
    * (partitioned on the query id — candidate count per query is bounded
    * by point density times the stencil area, never the corpus).
    */
  private def rankCandidates(cand: DataFrame, k: Int, radius: Double,
      qid: String, qx: String, qy: String,
      pid: String, px: String, py: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dx = col(qx) - col(px)
    val dy = col(qy) - col(py)
    val w = Window.partitionBy(col(qid)).orderBy(col("dist2"), col(pid))
    cand.withColumn("dist2", dx * dx + dy * dy)
      .filter(col("dist2") <= lit(radius * radius))
      .withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
      .select(col(qid), col(pid), col("dist2"), col("knn_rank"))
  }
}
