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

  test("blobs container answers the flagship query end-to-end") {
    val sd = Datasets.blobs(spark, length = 64, nCells = 8, pointsPerCell = 10)
    // bbox query + table cascade + per-gene counts (SURVEY.md §7.2 slice)
    val q = sd.query.boundingBox(Seq("x", "y"), Seq(0.0, 0.0), Seq(48.0, 48.0), "global")
    val counts = q("blobs_points").groupBy("instance_id", "genes").count()
    assert(counts.count() > 0)
    assert(q.element("blobs_table").obs.count() <= 8)
  }
}
