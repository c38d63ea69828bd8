package graft.geom

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal 2D geometry model matching the reference's shapes surface:
  * circles are Point + radius column, polygons and multipolygons are WKB
  * (reference `ShapesModel`, models.py:451-664; GeoParquet WKB IO,
  * io_shapes.py:152-183). No GEOS on executors — the kernel below implements
  * exactly the predicates/measures the reference uses.
  */
sealed trait Geom {
  def envelope: Array[Double] // minx, miny, maxx, maxy
}

final case class GPoint(x: Double, y: Double) extends Geom {
  def envelope: Array[Double] = Array(x, y, x, y)
}

/** rings: first = exterior, rest = holes; each ring is a closed flat
  * [x0,y0,x1,y1,...] with last vertex == first vertex allowed but not
  * required (the kernel closes implicitly).
  */
final case class GPolygon(rings: Array[Array[Double]]) extends Geom {
  def exterior: Array[Double] = rings(0)
  def envelope: Array[Double] = {
    var minx = Double.MaxValue; var miny = Double.MaxValue
    var maxx = Double.MinValue; var maxy = Double.MinValue
    val r = rings(0)
    var i = 0
    while (i < r.length) {
      val x = r(i); val y = r(i + 1)
      if (x < minx) minx = x; if (x > maxx) maxx = x
      if (y < miny) miny = y; if (y > maxy) maxy = y
      i += 2
    }
    Array(minx, miny, maxx, maxy)
  }
}

final case class GMultiPolygon(polys: Array[GPolygon]) extends Geom {
  def envelope: Array[Double] = {
    val es = polys.map(_.envelope)
    Array(es.map(_(0)).min, es.map(_(1)).min, es.map(_(2)).max, es.map(_(3)).max)
  }
}

/** WKB codec (OGC 99-049 well-known-binary; 2D, little- or big-endian reads,
  * little-endian writes). Z/M flags are rejected — the reference's `force_2d`
  * drops z before serialization (models/_utils.py:311-345).
  */
object WKB {
  val PointType = 1
  val PolygonType = 3
  val MultiPolygonType = 6

  def read(bytes: Array[Byte]): Geom = {
    val buf = ByteBuffer.wrap(bytes)
    readGeom(buf)
  }

  private def readGeom(buf: ByteBuffer): Geom = {
    val order = buf.get()
    buf.order(if (order == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val rawType = buf.getInt
    val geomType = rawType & 0xFFFF // tolerate EWKB SRID flag bits cleared below
    require((rawType & 0x80000000) == 0 && geomType < 1000,
      s"only 2D WKB supported, got type $rawType")
    geomType match {
      case PointType => GPoint(buf.getDouble, buf.getDouble)
      case PolygonType => readPolygonBody(buf)
      case MultiPolygonType =>
        val n = buf.getInt
        val polys = new Array[GPolygon](n)
        var i = 0
        while (i < n) {
          val o = buf.get()
          buf.order(if (o == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
          val t = buf.getInt
          require((t & 0xFFFF) == PolygonType, s"multipolygon member of type $t")
          polys(i) = readPolygonBody(buf)
          i += 1
        }
        GMultiPolygon(polys)
      case other => sys.error(s"unsupported WKB geometry type $other")
    }
  }

  private def readPolygonBody(buf: ByteBuffer): GPolygon = {
    val nRings = buf.getInt
    val rings = new Array[Array[Double]](nRings)
    var r = 0
    while (r < nRings) {
      val nPts = buf.getInt
      val ring = new Array[Double](nPts * 2)
      var i = 0
      while (i < nPts * 2) { ring(i) = buf.getDouble; i += 1 }
      rings(r) = ring
      r += 1
    }
    GPolygon(rings)
  }

  def write(g: Geom): Array[Byte] = g match {
    case GPoint(x, y) =>
      val buf = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
      buf.put(1.toByte).putInt(PointType).putDouble(x).putDouble(y)
      buf.array()
    case p: GPolygon =>
      val buf = ByteBuffer.allocate(polygonSize(p)).order(ByteOrder.LITTLE_ENDIAN)
      buf.put(1.toByte).putInt(PolygonType)
      writePolygonBody(buf, p)
      buf.array()
    case GMultiPolygon(polys) =>
      val size = 9 + polys.map(polygonSize).sum
      val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
      buf.put(1.toByte).putInt(MultiPolygonType).putInt(polys.length)
      polys.foreach { p =>
        buf.put(1.toByte).putInt(PolygonType)
        writePolygonBody(buf, p)
      }
      buf.array()
  }

  private def polygonSize(p: GPolygon): Int =
    9 + p.rings.map(r => 4 + r.length * 8).sum

  private def writePolygonBody(buf: ByteBuffer, p: GPolygon): Unit = {
    buf.putInt(p.rings.length)
    p.rings.foreach { ring =>
      buf.putInt(ring.length / 2)
      var i = 0
      while (i < ring.length) { buf.putDouble(ring(i)); i += 1 }
    }
  }

  // ---- force_2d (reference models/_utils.py:311-345) ----

  /** Rewrite WKB of any dimensionality to plain 2D WKB: accepts ISO
    * (+1000/+2000/+3000 type offsets) and EWKB (Z/M/SRID flag bits)
    * encodings of Point/Polygon/MultiPolygon and drops the Z/M ordinates.
    * Unlike the reference (which keeps only `shape.exterior`), interior
    * rings are preserved — dropping holes would change areas.
    * Already-2D input round-trips unchanged (canonical little-endian form).
    */
  def force2d(bytes: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.wrap(bytes)
    write(readGeomNd(buf))
  }

  private def parseTypeHeader(buf: ByteBuffer): (Int, Int) = {
    val order = buf.get()
    buf.order(if (order == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val raw = buf.getInt
    val hasSrid = (raw & 0x20000000) != 0
    if (hasSrid) buf.getInt // skip SRID
    val flagDims = (if ((raw & 0x80000000) != 0) 1 else 0) +
      (if ((raw & 0x40000000) != 0) 1 else 0)
    val base0 = raw & 0x1FFFFFFF & 0xFFFF
    val isoExtra = (base0 / 1000) match {
      case 1 | 2 => 1 // +1000 Z, +2000 M: one extra ordinate each
      case 3 => 2 // +3000 ZM
      case _ => 0
    }
    val extra = math.max(flagDims, isoExtra)
    (base0 % 1000, 2 + extra)
  }

  private def readGeomNd(buf: ByteBuffer): Geom = {
    val (geomType, dims) = parseTypeHeader(buf)
    geomType match {
      case PointType =>
        val x = buf.getDouble; val y = buf.getDouble
        var d = 2
        while (d < dims) { buf.getDouble; d += 1 }
        GPoint(x, y)
      case PolygonType => readPolygonBodyNd(buf, dims)
      case MultiPolygonType =>
        val n = buf.getInt
        val polys = new Array[GPolygon](n)
        var i = 0
        while (i < n) {
          val (t, memberDims) = parseTypeHeader(buf)
          require(t == PolygonType, s"multipolygon member of type $t")
          polys(i) = readPolygonBodyNd(buf, memberDims)
          i += 1
        }
        GMultiPolygon(polys)
      case other => sys.error(s"unsupported WKB geometry type $other")
    }
  }

  private def readPolygonBodyNd(buf: ByteBuffer, dims: Int): GPolygon = {
    val nRings = buf.getInt
    val rings = new Array[Array[Double]](nRings)
    var r = 0
    while (r < nRings) {
      val nPts = buf.getInt
      val ring = new Array[Double](nPts * 2)
      var i = 0
      while (i < nPts) {
        ring(i * 2) = buf.getDouble
        ring(i * 2 + 1) = buf.getDouble
        var d = 2
        while (d < dims) { buf.getDouble; d += 1 }
        i += 1
      }
      rings(r) = ring
      r += 1
    }
    GPolygon(rings)
  }
}
