package graft.query

import graft.model.SpatialDataset

/** Fluent container query accessor (`sdata.query.bounding_box/polygon`,
  * reference spatialdata.py:2466-2528). Import `graft.query.syntax._` and
  * call `sd.query.boundingBox(...)`.
  */
final class QueryManager(sd: SpatialDataset) {

  def boundingBox(axes: Seq[String], mins: Seq[Double], maxs: Seq[Double],
      targetCs: String = "global", filterTable: Boolean = true): SpatialDataset =
    SpatialQuery.boundingBox(sd, axes, mins, maxs, targetCs, filterTable)

  /** Polygon query across the container: points and shapes get the exact
    * predicate, labels/images the polygon envelope
    * (spatial_query.py:803-975).
    */
  def polygon(polyWkb: Array[Byte], targetCs: String = "global",
      filterTable: Boolean = true): SpatialDataset = {
    import graft.model._
    val filtered = sd.manifest.elements.flatMap { meta =>
      val el = sd.element(meta.name)
      meta.kind match {
        case ElementKind.Points =>
          val t = sd.transformTo(meta.name, targetCs)
          Some(el.copy(data = SpatialQuery.polygonQueryPoints(el.data, t, polyWkb)))
        case ElementKind.Shapes =>
          val t = sd.transformTo(meta.name, targetCs)
          Some(el.copy(data = SpatialQuery.polygonQueryShapes(el.data, t, polyWkb)))
        case ElementKind.Labels =>
          val t = sd.transformTo(meta.name, targetCs)
          Some(el.copy(data = SpatialQuery.polygonQueryLabels(el.data, t, meta.dims, polyWkb)))
        case ElementKind.Images =>
          val t = sd.transformTo(meta.name, targetCs)
          val env = graft.geom.WKB.read(polyWkb).envelope
          Some(el.copy(data = SpatialQuery.boundingBoxImageTiles(el.data, t,
            Seq(env(0), env(1)), Seq(env(2), env(3)))))
        case ElementKind.Tables => Some(el)
      }
    }
    val out = new SpatialDataset(sd.spark, sd.manifest,
      filtered.map(e => e.meta.name -> e).toMap)
    if (filterTable) RelationalQuery.filterTablesByElements(out) else out
  }
}

object syntax {
  implicit final class RichSpatialDataset(private val sd: SpatialDataset) extends AnyVal {
    def query: QueryManager = new QueryManager(sd)
  }
}
