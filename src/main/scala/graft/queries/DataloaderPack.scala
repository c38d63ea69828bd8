package graft.queries

import graft.{QueryPack, Tables}
import graft.geom.st._
import graft.model._
import graft.ops.ImageTiles
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataloader gates: the `tiles()` access path
  * (`reference/src/spatialdata/dataloader/datasets.py:41-509`) — tile
  * coordinate precompute and the batched tile crop, both verified against
  * SQL doing the same arithmetic directly.
  */
object DataloaderPack extends QueryPack {

  // regions: circles derived from supplier, sized to overlap the 64x64
  // events raster
  private def regions(s: SparkSession, d: String): DataFrame =
    Models.ShapesModel.parse(
      Tables.supplier(s, d).select(
        col("s_suppkey").as("index"),
        (col("s_suppkey") % 50 + 4.5).as("cx"),
        ((col("s_suppkey") * 3) % 50 + 4.5).as("cy"),
        (lit(3.0) + (col("s_suppkey") % 4).cast("double")).as("radius"))
        .withColumn("geometry", st_point(col("cx"), col("cy")))
        .withColumn("geom_type", lit("circle")),
      radiusCol = Some("radius"))

  private val regionsSql =
    """SELECT s_suppkey AS instance_id, s_suppkey % 50 + 4.5 AS cx,
      |  (s_suppkey * 3) % 50 + 4.5 AS cy,
      |  3.0 + CAST(s_suppkey % 4 AS DOUBLE) AS radius FROM supplier""".stripMargin

  private def eventPixels(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      (col("event_id") % 2).cast("int").as("c"),
      (col("event_id") % 64).cast("int").as("y"),
      (col("user_id") % 64).cast("int").as("x"))
      .groupBy("c", "y", "x").agg(count(lit(1)).cast("double").as("value"))

  private val eventPixelsSql =
    """SELECT CAST(event_id % 2 AS INT) AS c, CAST(event_id % 64 AS INT) AS y,
      |       CAST(user_id % 64 AS INT) AS x, CAST(COUNT(*) AS DOUBLE) AS value
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // tile-coordinate precompute through a target-cs transform
    // (_get_tile_coords, datasets.py:473-509): centroid transformed,
    // radius mean-scale-adjusted, extent = 2 * radius * tile_scale
    "q63_tile_coords" -> ((s, d) => {
      val t = AffineT(Matrix(3, 3, Array(2.0, 0.0, 3.0, 0.0, 2.0, -1.0, 0, 0, 1)),
        Seq("x", "y"), Seq("x", "y"))
      ImageTiles.tileCoords(regions(s, d), t, tileScale = 1.5)
        .orderBy(col("instance_id"))
    }),

    // batched tile crop (the vectorized multi-box query + __getitem__
    // payload, datasets.py:254-265): per-(tile, channel) pixel stats
    // computed from the assembled dense px arrays
    "q64_tile_batch" -> ((s, d) => {
      val coords = ImageTiles.tileCoords(regions(s, d))
      val batch = ImageTiles.tileBatch(eventPixels(s, d), coords, cell = 16.0)
      batch.select(col("instance_id"), col("c"), col("th"), col("tw"),
          size(filter(col("px"), v => v =!= 0.0)).cast("long").as("n_px"),
          aggregate(col("px"), lit(0.0), (a, v) => a + v).as("total"),
          aggregate(zip_with(col("px"),
            sequence(lit(0), col("th") * col("tw") - 1).cast("array<double>"),
            (v, i) => v * i), lit(0.0), (a, p) => a + p).as("pos_weighted"))
        .orderBy(col("instance_id"), col("c"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    // mirrors tileCoords arithmetic exactly: cx' = 2cx + 3, cy' = 2cy - 1,
    // radius scale = mean(2, 2) = 2, extent = ((r * 2) * (2 * 1.5))
    "q63_tile_coords" ->
      s"""WITH r AS ($regionsSql)
         |SELECT instance_id,
         |  2.0 * cx + 0.0 * cy + 3.0 AS x, 0.0 * cx + 2.0 * cy + -1.0 AS y,
         |  (radius * 2.0) * 3.0 AS extent,
         |  (2.0 * cx + 0.0 * cy + 3.0) - (radius * 2.0) * 3.0 / 2 AS minx,
         |  (0.0 * cx + 2.0 * cy + -1.0) - (radius * 2.0) * 3.0 / 2 AS miny,
         |  (2.0 * cx + 0.0 * cy + 3.0) + (radius * 2.0) * 3.0 / 2 AS maxx,
         |  (0.0 * cx + 2.0 * cy + -1.0) + (radius * 2.0) * 3.0 / 2 AS maxy
         |FROM r ORDER BY instance_id""".stripMargin,
    // identity cs, tile_scale 1: slice bounds floor(center - r)..ceil(center + r);
    // values are integral counts, so sums are order-independent in IEEE
    "q64_tile_batch" ->
      s"""WITH px AS ($eventPixelsSql),
         |t AS (
         |  SELECT instance_id,
         |    CAST(FLOOR(cy - (radius * 2.0) * 1.0 / 2) AS INT) AS y0,
         |    CAST(CEIL(cy + (radius * 2.0) * 1.0 / 2) AS INT) AS y1,
         |    CAST(FLOOR(cx - (radius * 2.0) * 1.0 / 2) AS INT) AS x0,
         |    CAST(CEIL(cx + (radius * 2.0) * 1.0 / 2) AS INT) AS x1
         |  FROM ($regionsSql))
         |SELECT t.instance_id, px.c, t.y1 - t.y0 AS th, t.x1 - t.x0 AS tw,
         |  COUNT(*) AS n_px, SUM(px.value) AS total,
         |  SUM(px.value * ((px.y - t.y0) * (t.x1 - t.x0) + (px.x - t.x0))) AS pos_weighted
         |FROM t JOIN px
         |  ON px.y >= t.y0 AND px.y < t.y1 AND px.x >= t.x0 AND px.x < t.x1
         |GROUP BY 1, 2, 3, 4 ORDER BY instance_id, c""".stripMargin
  )
}
