package graft.model

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.geom.{GMultiPolygon, GPoint, GPolygon, WKB}

/** Ingest-boundary WKB assembly kernels (geoarrow / GeoJSON → WKB),
  * invoked from generated code via `StaticInvoke` — the same pattern as
  * [[graft.geom.GeomKernel]] / [[graft.pipeline.TextKernel]], so the
  * shapes ingest paths (reference io_shapes.py:33-150, models.py:624-649)
  * stay inside whole-stage codegen and plan clean under
  * [[graft.functions.GraftGuardrails]] `fail` mode — these were the
  * engine's last per-row `ScalaUDF`s.
  *
  * Method names are UNIQUE within the object (StaticInvoke resolves by
  * name); arguments are Catalyst-internal types (`ArrayData`,
  * `UTF8String`), returns are `Array[Byte]` WKB.
  */
object ShapeKernel {

  /** Interleaved `[x, y]` doubles → point WKB (geoarrow `struct<x,y>`,
    * pre-flattened by a codegen'd `array(x, y)`).
    */
  def wkbPointXY(xy: ArrayData): Array[Byte] =
    WKB.write(GPoint(xy.getDouble(0), xy.getDouble(1)))

  /** Rings of interleaved doubles → polygon WKB (ring 0 exterior, rest
    * holes — the geoarrow polygon encoding after the codegen'd
    * flatten(transform(...))).
    */
  def wkbPolygonRings(rings: ArrayData): Array[Byte] = {
    val n = rings.numElements()
    val out = new Array[Array[Double]](n)
    var i = 0
    while (i < n) { out(i) = rings.getArray(i).toDoubleArray(); i += 1 }
    WKB.write(GPolygon(out))
  }

  /** Polygons of rings of interleaved doubles → multipolygon WKB. */
  def wkbMultiPolygonParts(polys: ArrayData): Array[Byte] = {
    val n = polys.numElements()
    val out = new Array[GPolygon](n)
    var i = 0
    while (i < n) {
      val rs = polys.getArray(i)
      val m = rs.numElements()
      val rr = new Array[Array[Double]](m)
      var j = 0
      while (j < m) { rr(j) = rs.getArray(j).toDoubleArray(); j += 1 }
      out(i) = GPolygon(rr)
      i += 1
    }
    WKB.write(GMultiPolygon(out))
  }

  /** One GeoJSON geometry (or Feature) object → 2D WKB. Z ordinates are
    * dropped (the reference's shapely parse + force_2d stance,
    * models.py:624-649). The per-row JSON parse is an ingest-boundary
    * cost, like the zarr chunk codec; everything downstream stays on WKB.
    */
  def geoJsonToWkb(s: UTF8String): Array[Byte] = parseGeoJson0(s.toString)

  private def parseGeoJson0(jsonStr: String): Array[Byte] = {
    import org.json4s._
    implicit val fmt: Formats = DefaultFormats
    val j0 = org.json4s.jackson.JsonMethods.parse(jsonStr)
    val j = (j0 \ "type") match {
      case JString("Feature") => j0 \ "geometry"
      case _ => j0
    }
    def ring(r: Seq[Seq[Double]]): Array[Double] =
      r.iterator.flatMap(p => Iterator(p(0), p(1))).toArray
    (j \ "type") match {
      case JString("Point") =>
        val c = (j \ "coordinates").extract[Seq[Double]]
        WKB.write(GPoint(c(0), c(1)))
      case JString("Polygon") =>
        val rings = (j \ "coordinates").extract[Seq[Seq[Seq[Double]]]]
        WKB.write(GPolygon(rings.map(ring).toArray))
      case JString("MultiPolygon") =>
        val polys = (j \ "coordinates").extract[Seq[Seq[Seq[Seq[Double]]]]]
        WKB.write(GMultiPolygon(polys.map(p => GPolygon(p.map(ring).toArray)).toArray))
      case other => sys.error(s"unsupported GeoJSON geometry type $other " +
        "(Point, Polygon, MultiPolygon)")
    }
  }
}
