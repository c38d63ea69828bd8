package graft.tools

import graft.model.Datasets
import graft.query.syntax._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end demo of the library surface (SURVEY.md §7.2 flagship slice):
  * generate the blobs container, run a bounding-box query with table
  * cascade, count transcripts per (cell, gene).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sd = Datasets.blobs(spark, length = 128, nCells = 16, pointsPerCell = 100)
    println(s"[demo] container: ${sd.manifest.elements.map(_.name).sorted.mkString(", ")}")

    val q = sd.query.boundingBox(Seq("x", "y"), Seq(0.0, 0.0), Seq(96.0, 96.0), "global")
    val counts = q("blobs_points").groupBy("instance_id", "genes").count()
    println(s"[demo] transcripts in box: ${q("blobs_points").count()}; " +
      s"(cell, gene) groups: ${counts.count()}; " +
      s"annotated cells surviving cascade: ${q.element("blobs_table").obs.count()}")

    val polys = graft.ops.Vectorize.labelsToPolygons(sd("blobs_labels"))
    println(s"[demo] labels -> polygons: ${polys.count()} shapes, " +
      s"total area ${polys.select(sum(graft.geom.st.st_area(col("geometry")))).collect()(0).getDouble(0)}")
    spark.stop()
  }
}
