package graft.geom

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Spatial column functions.
  *
  * Each lowers to a `StaticInvoke` of [[GeomKernel]] — a plain static call in
  * generated code, so the predicates stay inside whole-stage codegen (no UDF
  * serialization, no codegen fallback).
  */
object st {

  private val K: Class[_] = Class.forName("graft.geom.GeomKernel")

  private val B = BinaryType
  private val D = DoubleType

  private def inv(dt: DataType, fn: String, inputTypes: Seq[DataType],
      nullable: Boolean, args: Column*): Column =
    Bridge.staticInvoke(K, dt, fn, args.toSeq, inputTypes, nullable)

  /** Polygon/multipolygon area (shoelace; holes subtract). */
  def st_area(geom: Column): Column = inv(D, "area", Seq(B), nullable = false, geom)

  def st_centroid_x(geom: Column): Column = inv(D, "centroidX", Seq(B), nullable = false, geom)
  def st_centroid_y(geom: Column): Column = inv(D, "centroidY", Seq(B), nullable = false, geom)

  def st_minx(geom: Column): Column = inv(D, "envelopeMinX", Seq(B), nullable = false, geom)
  def st_miny(geom: Column): Column = inv(D, "envelopeMinY", Seq(B), nullable = false, geom)
  def st_maxx(geom: Column): Column = inv(D, "envelopeMaxX", Seq(B), nullable = false, geom)
  def st_maxy(geom: Column): Column = inv(D, "envelopeMaxY", Seq(B), nullable = false, geom)

  /** Point-in-geometry predicate (ray casting, boundary-inclusive). */
  def st_contains_point(geom: Column, x: Column, y: Column): Column =
    inv(BooleanType, "containsPoint", Seq(B, D, D), nullable = false, geom, x, y)

  /** Exact geometry-geometry intersects. Pair with a coarse bbox-column
    * range predicate first — that is the scan-prunable stage.
    */
  def st_intersects(a: Column, b: Column): Column =
    inv(BooleanType, "intersects", Seq(B, B), nullable = false, a, b)

  def st_intersects_box(geom: Column, minx: Column, miny: Column,
      maxx: Column, maxy: Column): Column =
    inv(BooleanType, "intersectsBox", Seq(B, D, D, D, D), nullable = false,
      geom, minx, miny, maxx, maxy)

  /** Affine-transform every coordinate in the WKB stream. */
  def st_affine(geom: Column, m00: Column, m01: Column, t0: Column,
      m10: Column, m11: Column, t1: Column): Column =
    inv(B, "affine", Seq(B, D, D, D, D, D, D), nullable = false,
      geom, m00, m01, t0, m10, m11, t1)

  /** Point WKB constructor. */
  def st_point(x: Column, y: Column): Column =
    inv(B, "makePoint", Seq(D, D), nullable = false, x, y)

  /** Axis-aligned box polygon constructor. */
  def st_make_box(minx: Column, miny: Column, maxx: Column, maxy: Column): Column =
    inv(B, "makeBox", Seq(D, D, D, D), nullable = false, minx, miny, maxx, maxy)

  /** Circle -> n-gon polygon WKB. */
  def st_buffer_point(x: Column, y: Column, radius: Column, quadSegs: Column): Column =
    inv(B, "bufferPoint", Seq(D, D, D, IntegerType), nullable = false, x, y, radius, quadSegs)

  /** Packed (y<<32|x) grid cells whose center the geometry covers. */
  def st_cover_cells(geom: Column, x0: Column, y0: Column, sx: Column,
      sy: Column, width: Column, height: Column): Column =
    inv(ArrayType(LongType, containsNull = false), "coverCells",
      Seq(B, D, D, D, D, IntegerType, IntegerType), nullable = false,
      geom, x0, y0, sx, sy, width, height)

  /** Clip by a convex polygon; null when the intersection is empty. */
  def st_clip_convex(geom: Column, clip: Column): Column =
    inv(B, "clipByConvex", Seq(B, B), nullable = true, geom, clip)

  /** Clip by an arbitrary simple polygon (reflex allowed): convex clips
    * single-pass, non-convex via convex decomposition — the result is a
    * multipolygon partition of the intersection. Null when empty.
    */
  def st_clip(geom: Column, clip: Column): Column =
    inv(B, "clipGeneral", Seq(B, B), nullable = true, geom, clip)

  /** Area of (geom ∩ convex clip) — the fractions=True weight. */
  def st_intersection_area_convex(geom: Column, clip: Column): Column =
    inv(D, "intersectionAreaConvex", Seq(B, B), nullable = false, geom, clip)

  /** Area of (A ∩ B), arbitrary simple polygons incl. holes (general
    * fractions weight; no convexity assumption).
    */
  def st_intersection_area(a: Column, b: Column): Column =
    inv(D, "intersectionArea", Seq(B, B), nullable = false, a, b)

  /** Axis-aligned L-shape (canonical non-convex shape). */
  def st_make_l_shape(x0: Column, y0: Column, w: Column, h1: Column,
      w2: Column, h2: Column): Column =
    inv(B, "makeLShape", Seq(D, D, D, D, D, D), nullable = false,
      x0, y0, w, h1, w2, h2)

  /** Drop Z/M ordinates, rewriting to canonical 2D WKB (force_2d). */
  def st_force_2d(geom: Column): Column =
    inv(B, "force2d", Seq(B), nullable = false, geom)

  /** Geometry-kind name ("point"/"polygon"/"multipolygon"). */
  def st_geom_type(geom: Column): Column =
    inv(StringType, "geomTypeName", Seq(B), nullable = false, geom)
}
