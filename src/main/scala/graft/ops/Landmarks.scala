package graft.ops

import graft.model._
import org.apache.spark.sql.DataFrame

/** Landmark-based alignment (`get_transformation_between_landmarks` /
  * `align_elements_using_landmarks`,
  * `reference/src/spatialdata/transformations/operations.py:347-510`):
  * least-squares similarity fit between two small landmark sets, with the
  * reference's flip-detection — when the full-affine fit has negative
  * determinant, the moving set is mirrored about its x-midline and the
  * similarity is fit on the mirrored points.
  *
  * Landmarks are tiny by definition (n >= 3 hand-placed points), so the
  * fit itself is driver math on collected coordinates — the same shape as
  * the reference computing on numpy arrays.
  */
object Landmarks {

  /** Least-squares similarity (the `estimate_transform("similarity")`
    * algorithm for the non-reflective case): rotation + uniform scale +
    * translation minimizing ||dst - (sR src + t)||^2, closed form in 2D.
    * Equals the Umeyama solution whenever the src/dst covariance has
    * non-negative determinant — which the caller guarantees by handling
    * reflections explicitly (the flip branch below), exactly like the
    * reference's flow.
    */
  def estimateSimilarity(src: Seq[(Double, Double)],
      dst: Seq[(Double, Double)]): Matrix = {
    require(src.size == dst.size && src.size >= 2, "need >= 2 point pairs")
    val n = src.size.toDouble
    val (mxS, myS) = (src.map(_._1).sum / n, src.map(_._2).sum / n)
    val (mxD, myD) = (dst.map(_._1).sum / n, dst.map(_._2).sum / n)
    var sc = 0.0; var ss = 0.0; var varS = 0.0
    src.zip(dst).foreach { case ((xs, ys), (xd, yd)) =>
      val (cxs, cys) = (xs - mxS, ys - myS)
      val (cxd, cyd) = (xd - mxD, yd - myD)
      sc += cxs * cxd + cys * cyd
      ss += cxs * cyd - cys * cxd
      varS += cxs * cxs + cys * cys
    }
    require(varS > 1e-12, "degenerate source landmarks")
    val theta = math.atan2(ss, sc)
    val scale = math.sqrt(sc * sc + ss * ss) / varS
    val (c, s) = (math.cos(theta), math.sin(theta))
    val (r00, r01, r10, r11) = (scale * c, -scale * s, scale * s, scale * c)
    val tx = mxD - (r00 * mxS + r01 * myS)
    val ty = myD - (r10 * mxS + r11 * myS)
    Matrix(3, 3, Array(r00, r01, tx, r10, r11, ty, 0.0, 0.0, 1.0))
  }

  /** Full least-squares affine (the `estimate_transform("affine")`
    * algorithm): normal equations per output coordinate.
    */
  def estimateAffine(src: Seq[(Double, Double)],
      dst: Seq[(Double, Double)]): Matrix = {
    require(src.size == dst.size && src.size >= 3, "need >= 3 point pairs")
    var sxx = 0.0; var sxy = 0.0; var sx = 0.0
    var syy = 0.0; var sy = 0.0; var n = 0.0
    var bx0 = 0.0; var bx1 = 0.0; var bx2 = 0.0
    var by0 = 0.0; var by1 = 0.0; var by2 = 0.0
    src.zip(dst).foreach { case ((xs, ys), (xd, yd)) =>
      sxx += xs * xs; sxy += xs * ys; sx += xs
      syy += ys * ys; sy += ys; n += 1
      bx0 += xs * xd; bx1 += ys * xd; bx2 += xd
      by0 += xs * yd; by1 += ys * yd; by2 += yd
    }
    val ata = Matrix(3, 3, Array(sxx, sxy, sx, sxy, syy, sy, sx, sy, n))
    val inv = ata.inverseMatrix
    def solve(b0: Double, b1: Double, b2: Double): (Double, Double, Double) =
      (inv(0, 0) * b0 + inv(0, 1) * b1 + inv(0, 2) * b2,
        inv(1, 0) * b0 + inv(1, 1) * b1 + inv(1, 2) * b2,
        inv(2, 0) * b0 + inv(2, 1) * b1 + inv(2, 2) * b2)
    val (p0, p1, p2) = solve(bx0, bx1, bx2)
    val (q0, q1, q2) = solve(by0, by1, by2)
    Matrix(3, 3, Array(p0, p1, p2, q0, q1, q2, 0.0, 0.0, 1.0))
  }

  private def collectXy(df: DataFrame): Seq[(Double, Double)] = {
    import org.apache.spark.sql.functions.col
    df.select(col("x").cast("double"), col("y").cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
  }

  /** The similarity transformation mapping `moving` onto `references`
    * (operations.py:347-445): full-affine fit first to detect a flip
    * (det < 0); if flipped, mirror the moving set about its x-midline
    * (x -> -x + 2m, m = (max_x - min_x)/2) and fit the similarity on the
    * mirrored points, returning Sequence(flip, similarity) as one Affine.
    */
  def transformationBetweenLandmarks(references: DataFrame,
      moving: DataFrame): AffineT = {
    val refs = collectXy(references)
    val mov = collectXy(moving)
    require(refs.size == mov.size && refs.size >= 3, "need >= 3 landmarks")
    val affine = estimateAffine(mov, refs)
    val det = affine(0, 0) * affine(1, 1) - affine(0, 1) * affine(1, 0)
    val axes = Seq("x", "y")
    val m: Matrix =
      if (det < 0) {
        val xs = mov.map(_._1)
        val mid = (xs.max - xs.min) / 2
        val flip = Matrix(3, 3, Array(-1.0, 0.0, 2 * mid, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0))
        val flipped = mov.map { case (x, y) => (-x + 2 * mid, y) }
        estimateSimilarity(flipped, refs) * flip
      } else estimateSimilarity(mov, refs)
    AffineT(m, axes, axes)
  }

  /** `align_elements_using_landmarks` (operations.py:448-510): register
    * both elements into `newCs` — the moving element through
    * Sequence(old transform, landmark affine), the reference through its
    * old transform. Returns the updated container and the moving
    * element's new transform.
    */
  def alignElementsUsingLandmarks(sd: SpatialDataset,
      references: DataFrame, moving: DataFrame,
      referenceElement: String, movingElement: String,
      referenceCs: String = "global", movingCs: String = "global",
      newCs: String): (SpatialDataset, Transform) = {
    val affine = transformationBetweenLandmarks(references, moving)
    val oldMoving = sd.transformTo(movingElement, movingCs)
    val oldReference = sd.transformTo(referenceElement, referenceCs)
    val newMoving = Transform.sequence(oldMoving, affine)
    val movEl = sd.element(movingElement)
    val refEl = sd.element(referenceElement)
    val updated = sd
      .withElement(movEl.copy(meta = movEl.meta.copy(
        transforms = movEl.meta.transforms + (newCs -> newMoving))))
      .withElement(refEl.copy(meta = refEl.meta.copy(
        transforms = refEl.meta.transforms + (newCs -> oldReference))))
    (updated, newMoving)
  }
}
