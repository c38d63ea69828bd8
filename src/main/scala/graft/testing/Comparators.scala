package graft.testing

import graft.model.{ElementKind, SpatialDataset, SpatialElement}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Floating-point tolerance policy for element data comparison.
  *
  * The reference compares geometries "less precisely" than everything else
  * (`testing.py:126` passes `check_less_precise=True` to geopandas while
  * rasters/points/tables compare exactly); [[Tolerance.KindDefault]]
  * mirrors that — shapes round floating columns to 6 decimals, every other
  * kind compares bit-exact. Override with [[Tolerance.Exact]] or
  * [[Tolerance.Decimals]] when a pipeline legitimately perturbs values
  * (e.g. a transform round-trip through an affine and its inverse).
  */
sealed trait Tolerance
object Tolerance {
  /** Shapes → 6 decimals; all other kinds exact. */
  case object KindDefault extends Tolerance
  case object Exact extends Tolerance
  final case class Decimals(n: Int) extends Tolerance {
    require(n >= 0 && n <= 18, s"decimals must be in [0, 18], got $n")
  }
}

/** Golden-output comparison for elements and containers — the engine's
  * `spatialdata.testing` (reference `testing.py:21-190`:
  * `assert_elements_are_identical` /
  * `assert_spatial_data_objects_are_identical`), re-expressed for
  * distributed data: element DataFrames are compared as MULTISETS via a
  * two-sided `exceptAll` (one shuffle each way, no driver collect of the
  * data — only up to [[Comparators.SampleRows]] offending rows come back
  * for the failure message).
  *
  * Semantics mirrored from the reference:
  *  - kinds must match (`testing.py:103` `type(element0) is type(element1)`);
  *  - `checkTransformations` without `checkMetadata` is rejected
  *    (`testing.py:105-106`);
  *  - transforms compare by coordinate-system key AND exact transform
  *    equality (`testing.py:112-118`) — like the reference, axis-permuted
  *    but equivalent transforms count as DIFFERENT;
  *  - container compare: element-name sets, coordinate-system sets, every
  *    element, then container attrs when `checkMetadata`
  *    (`testing.py:173-190`).
  *
  * Example:
  * {{{
  *   val sdata  = Datasets.blobs(spark)
  *   sdata.write("/tmp/c1")
  *   val back = SpatialDataset.read(spark, "/tmp/c1")
  *   Comparators.assertContainersIdentical(sdata, back)
  * }}}
  */
object Comparators {

  /** Max offending rows collected into an AssertionError message. */
  val SampleRows = 5

  def assertElementsIdentical(e0: SpatialElement, e1: SpatialElement,
      checkTransformations: Boolean = true, checkMetadata: Boolean = true,
      tolerance: Tolerance = Tolerance.KindDefault): Unit = {
    require(!(checkTransformations && !checkMetadata),
      "checkTransformations cannot be true if checkMetadata is false")
    assertThat(e0.meta.kind == e1.meta.kind,
      s"element kinds differ: ${e0.meta.kind} vs ${e1.meta.kind}")
    if (checkTransformations) {
      val (t0, t1) = (e0.meta.transforms, e1.meta.transforms)
      assertThat(t0.keySet == t1.keySet,
        s"coordinate systems differ for '${e0.meta.name}': " +
          s"${t0.keySet.toSeq.sorted} vs ${t1.keySet.toSeq.sorted}")
      // value equality via the manifest's JSON encoding — AffineT holds a
      // Matrix whose Array[Double] would otherwise compare by reference
      for (cs <- t0.keySet)
        assertThat(graft.model.GraftManifest.transformToJson(t0(cs)) ==
            graft.model.GraftManifest.transformToJson(t1(cs)),
          s"transform to '$cs' differs for '${e0.meta.name}': " +
            s"${t0(cs)} vs ${t1(cs)}")
    }
    if (checkMetadata) {
      assertThat(e0.meta.dims == e1.meta.dims,
        s"dims differ for '${e0.meta.name}': ${e0.meta.dims} vs ${e1.meta.dims}")
      assertThat(e0.meta.channelNames == e1.meta.channelNames,
        s"channel names differ for '${e0.meta.name}': " +
          s"${e0.meta.channelNames} vs ${e1.meta.channelNames}")
      assertThat(e0.meta.table == e1.meta.table,
        s"table annotation differs for '${e0.meta.name}': " +
          s"${e0.meta.table} vs ${e1.meta.table}")
      assertThat(e0.meta.attrs == e1.meta.attrs,
        s"attrs differ for '${e0.meta.name}': ${e0.meta.attrs} vs ${e1.meta.attrs}")
    }
    val decimals = tolerance match {
      case Tolerance.KindDefault =>
        if (e0.meta.kind == ElementKind.Shapes) Some(6) else None
      case Tolerance.Exact => None
      case Tolerance.Decimals(n) => Some(n)
    }
    assertDataFramesEqual(e0.data, e1.data, s"element '${e0.meta.name}'", decimals)
    assertThat(e0.aux.keySet == e1.aux.keySet,
      s"aux frames differ for '${e0.meta.name}': " +
        s"${e0.aux.keySet.toSeq.sorted} vs ${e1.aux.keySet.toSeq.sorted}")
    for (k <- e0.aux.keySet.toSeq.sorted)
      assertDataFramesEqual(e0.aux(k), e1.aux(k),
        s"element '${e0.meta.name}' aux '$k'", decimals)
  }

  def assertContainersIdentical(s0: SpatialDataset, s1: SpatialDataset,
      checkTransformations: Boolean = true, checkMetadata: Boolean = true,
      tolerance: Tolerance = Tolerance.KindDefault): Unit = {
    val (n0, n1) = (s0.manifest.elements.map(_.name), s1.manifest.elements.map(_.name))
    assertThat(n0.toSet == n1.toSet,
      s"element names differ: only-left=${(n0.toSet -- n1.toSet).toSeq.sorted}, " +
        s"only-right=${(n1.toSet -- n0.toSet).toSeq.sorted}")
    assertThat(s0.manifest.coordinateSystems.toSet == s1.manifest.coordinateSystems.toSet,
      s"coordinate systems differ: ${s0.manifest.coordinateSystems} vs " +
        s"${s1.manifest.coordinateSystems}")
    for (name <- n0.sorted)
      assertElementsIdentical(s0.element(name), s1.element(name),
        checkTransformations, checkMetadata, tolerance)
    if (checkMetadata)
      assertThat(s0.manifest.freeAttrs == s1.manifest.freeAttrs &&
          s0.manifest.attrs == s1.manifest.attrs,
        s"container attrs differ: ${s0.manifest.attrs}/${s0.manifest.freeAttrs} " +
          s"vs ${s1.manifest.attrs}/${s1.manifest.freeAttrs}")
  }

  /** Multiset equality of two DataFrames: same columns (order-insensitive,
    * matched by name) with identical dtypes, and a two-sided `exceptAll`
    * that must come back empty — two keyed shuffles, no row limit, no
    * driver materialization beyond the failure sample. `decimals` rounds
    * float/double columns (including inside arrays) before comparing.
    */
  def assertDataFramesEqual(a: DataFrame, b: DataFrame, what: String,
      decimals: Option[Int]): Unit = {
    assertThat(a.columns.sorted.toSeq == b.columns.sorted.toSeq,
      s"$what: columns differ: ${a.columns.sorted.toSeq} vs ${b.columns.sorted.toSeq}")
    val cols = a.columns.sorted.toSeq
    // nullability flags are storage artifacts (a parquet round-trip widens
    // them), not data differences — compare types modulo nullability
    for (c <- cols)
      assertThat(stripNullability(a.schema(c).dataType) ==
          stripNullability(b.schema(c).dataType),
        s"$what: dtype of '$c' differs: ${a.schema(c).dataType} vs ${b.schema(c).dataType}")
    def norm(df: DataFrame): DataFrame = df.select(cols.map { c =>
      normalize(col(c), df.schema(c).dataType, decimals).as(c)
    }: _*)
    val (na, nb) = (norm(a), norm(b))
    val onlyA = na.exceptAll(nb)
    val onlyB = nb.exceptAll(na)
    val sampleA = onlyA.take(SampleRows)
    assertThat(sampleA.isEmpty,
      s"$what: rows only in left (sample): ${sampleA.mkString("; ")}")
    val sampleB = onlyB.take(SampleRows)
    assertThat(sampleB.isEmpty,
      s"$what: rows only in right (sample): ${sampleB.mkString("; ")}")
  }

  private def normalize(c: Column, dt: DataType, decimals: Option[Int]): Column =
    decimals match {
      case None => c
      case Some(d) => dt match {
        case DoubleType | FloatType => round(c.cast("double"), d)
        case ArrayType(DoubleType | FloatType, _) =>
          transform(c, x => round(x.cast("double"), d))
        case _ => c
      }
    }

  private def stripNullability(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => ArrayType(stripNullability(et), containsNull = true)
    case MapType(kt, vt, _) =>
      MapType(stripNullability(kt), stripNullability(vt), valueContainsNull = true)
    case StructType(fields) => StructType(fields.map(f =>
      f.copy(dataType = stripNullability(f.dataType), nullable = true)))
    case other => other
  }

  private def assertThat(cond: Boolean, msg: => String): Unit =
    if (!cond) throw new AssertionError(msg)
}
