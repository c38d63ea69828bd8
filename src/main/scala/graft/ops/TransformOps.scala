package graft.ops

import graft.geom.st._
import graft.model._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Geometric transform operators (`_core/operations/transform.py`):
  * apply a (composed) transformation to element data.
  *
  * Points transform to a pure generated projection (codegen'd, partition-
  * preserving — the reference needs dask-graph surgery for the same thing,
  * transform.py:429-503). Shapes map every WKB coordinate through the
  * affine kernel; circle radii scale by the mean scale factor
  * (transform.py:506-547). Rasters go through RasterOps.affineResample
  * (inverse-affine gather, transform.py:38-105).
  */
object TransformOps {

  /** Transform a points element into `cs` coordinates: x' = m00 x + m01 y +
    * t, ... — a plain select, fully codegen.
    */
  def transformPoints(df: DataFrame, t: Transform,
      axes: Seq[String] = Seq("x", "y")): DataFrame = {
    val m = t.toAffineMatrix(axes, axes)
    val n = axes.size
    val projected = axes.zipWithIndex.map { case (ax, i) =>
      axes.indices.map(j => lit(m(i, j)) * col(axes(j))).reduce(_ + _)
        .+(lit(m(i, n))).as(ax)
    }
    val rest = df.columns.filterNot(axes.contains).map(col)
    df.select(projected ++ rest: _*)
  }

  /** Transform a shapes element: WKB coordinates through the affine kernel;
    * radius scaled by mean(|sx|, |sy|) (scale_radii, transform.py:529-536);
    * envelope columns recomputed.
    */
  def transformShapes(df: DataFrame, t: Transform): DataFrame = {
    val m = t.toAffineMatrix(Seq("x", "y"), Seq("x", "y"))
    val radiusScale = (math.sqrt(m(0, 0) * m(0, 0) + m(1, 0) * m(1, 0)) +
      math.sqrt(m(0, 1) * m(0, 1) + m(1, 1) * m(1, 1))) / 2.0
    val moved = df
      .withColumn("geometry", st_affine(col("geometry"),
        lit(m(0, 0)), lit(m(0, 1)), lit(m(0, 2)),
        lit(m(1, 0)), lit(m(1, 1)), lit(m(1, 2))))
      .withColumn("radius", col("radius") * radiusScale)
    Models.ShapesModel.parse(moved.drop("minx", "miny", "maxx", "maxy"))
  }

  /** Transform an element of a container to a coordinate system and record
    * the bookkeeping: data moves, the element's transform to `cs` becomes
    * Identity (transform_element_to_coordinate_system,
    * spatialdata.py:780-893).
    */
  def transformElementToCs(sd: SpatialDataset, name: String, cs: String): SpatialDataset = {
    val el = sd.element(name)
    val t = sd.transformTo(name, cs)
    val newData = el.meta.kind match {
      case ElementKind.Points => transformPoints(el.data, t, el.meta.dims)
      case ElementKind.Shapes => transformShapes(el.data, t)
      case other => sys.error(s"transformElementToCs: unsupported kind $other (rasters go through affineResample)")
    }
    val newMeta = el.meta.copy(transforms = el.meta.transforms + (cs -> IdentityT))
    sd.withElement(SpatialElement(newMeta, newData, el.aux))
  }
}
