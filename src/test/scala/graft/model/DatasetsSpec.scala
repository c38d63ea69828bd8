package graft.model

import graft.SparkTestBase
import graft.query.syntax._
import org.apache.spark.sql.functions._

class DatasetsSpec extends SparkTestBase {

  test("blobs generates a coherent, deterministic container") {
    val sd = Datasets.blobs(spark, length = 64, nCells = 8, pointsPerCell = 10)
    assert(sd.manifest.elements.map(_.name).sorted == Seq(
      "blobs_circles", "blobs_image", "blobs_labels", "blobs_points", "blobs_table"))
    assert(sd("blobs_points").count() == 80)
    assert(sd("blobs_circles").count() == 8)
    // labels annotate the table: every obs instance exists in labels
    val labelIds = sd("blobs_labels").select("label").filter(col("label") =!= 0)
      .distinct().collect().map(_.getLong(0)).toSet
    val obsIds = sd.element("blobs_table").obs.select("instance_id")
      .collect().map(_.getLong(0)).toSet
    assert(labelIds.subsetOf(obsIds))
    // deterministic: same seed -> same content hash
    val a = Datasets.blobs(spark, 64, 8, 10).apply("blobs_points")
      .agg(sum(col("x") + col("y"))).collect()(0).getDouble(0)
    val b = sd("blobs_points").agg(sum(col("x") + col("y"))).collect()(0).getDouble(0)
    assert(a == b)
  }

  test("raccoon demo: image + segmentation + fixed circles, deterministic") {
    val sd = Datasets.raccoon(spark, height = 64, width = 96, nSegments = 12)
    assert(sd.manifest.elements.map(_.name).sorted ==
      Seq("circles", "raccoon", "segmentation"))
    // the reference's marker circles survive exactly (datasets.py:96-97)
    val c = sd("circles").orderBy("index")
      .select("index", "radius").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(c.toSeq == Seq((0L, 30.0), (1L, 30.0), (2L, 30.0), (3L, 50.0)))
    // every pixel is labeled with one of the 1-based segment ids
    val segs = sd("segmentation").select("label").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(segs.nonEmpty && segs.subsetOf((1L to 12L).toSet))
    assert(sd("segmentation").count() == 64L * 96L)
    // 3 channels, deterministic content
    val img = graft.ops.RasterOps.tilesToPixels(sd("raccoon"),
      sd.manifest.element("raccoon").attrs.get("tile_size").map(_.toInt)
        .getOrElse(Models.ImageModel.TileSize))
    assert(img.select("c").distinct().count() == 3)
    val s1 = img.agg(sum("value")).collect()(0).getDouble(0)
    val s2 = graft.ops.RasterOps.tilesToPixels(
      Datasets.raccoon(spark, 64, 96, 12)("raccoon"),
      Models.ImageModel.TileSize).agg(sum("value")).collect()(0).getDouble(0)
    assert(s1 == s2)
  }

  test("blobs container answers the flagship query end-to-end") {
    val sd = Datasets.blobs(spark, length = 64, nCells = 8, pointsPerCell = 10)
    // bbox query + table cascade + per-gene counts (SURVEY.md §7.2 slice)
    val q = sd.query.boundingBox(Seq("x", "y"), Seq(0.0, 0.0), Seq(48.0, 48.0), "global")
    val counts = q("blobs_points").groupBy("instance_id", "genes").count()
    assert(counts.count() > 0)
    assert(q.element("blobs_table").obs.count() <= 8)
  }
}
