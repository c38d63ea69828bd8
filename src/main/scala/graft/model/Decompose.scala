package graft.model

/** Affine decomposition (`_decompose_transformation`,
  * `reference/src/spatialdata/transformations/transformations.py:837-966`):
  * split a 2D transformation into either (linear, translation) or the full
  * (reflection, rotation, shear, scale, translation) chain via RQ
  * factorization. Driver-side math; `c` passes through untouched, `z` is
  * rejected like the reference.
  */
object Decompose {

  /** Decompose `t` on `inputAxes` (("x","y") or ("c","x","y") etc).
    * `simple = true`: Sequence(linear, translation).
    * `simple = false`: Sequence(inversion, rotation, shear, scale,
    * translation) with inversion = Scale in {-1, 1}, rotation det 1,
    * shear upper-triangular unit-diagonal, scale positive.
    */
  def decompose(t: Transform, inputAxes: Seq[String],
      simple: Boolean = true): SequenceT = {
    require(!inputAxes.contains("z"), "the transformation should not transform the z axis")
    val m = t.toAffineMatrix(inputAxes, inputAxes)
    if (inputAxes.contains("c")) {
      val ci = inputAxes.indexOf("c")
      val n = inputAxes.size
      require(m(ci, ci) == 1.0 &&
        (0 to n).forall(j => j == ci || m(ci, j) == 0.0) &&
        (0 to n).forall(i => i == ci || m(i, ci) == 0.0),
        "the transformation should not transform the c channel")
    }
    val axes = inputAxes.filterNot(_ == "c")
    require(axes == Seq("x", "y") || axes == Seq("y", "x"),
      s"2D decomposition requires exactly the x/y axes, got $axes")
    val mm = t.toAffineMatrix(axes, axes)
    val a = Array(mm(0, 0), mm(0, 1), mm(1, 0), mm(1, 1))
    val translation = Seq(mm(0, 2), mm(1, 2))

    val seq = if (simple) {
      val linear = AffineT(Matrix(3, 3, Array(
        a(0), a(1), 0.0, a(2), a(3), 0.0, 0.0, 0.0, 1.0)), axes, axes)
      SequenceT(List(linear, TranslationT(translation, axes)))
    } else {
      // RQ: A = R Q with Q a proper rotation (Givens choice zeroing R(1,0))
      val phi = math.atan2(a(2), a(3))
      val (c, s) = (math.cos(phi), math.sin(phi))
      // R = A Q^T, Q = [[c, -s], [s, c]]: r10 = a2*c - a3*s = 0 by choice of phi
      val r00 = a(0) * c - a(1) * s
      val r01 = a(0) * s + a(1) * c
      val r11 = a(2) * s + a(3) * c
      // scale = |diag(R)|; shear = inv(scale) R has diagonal in {-1, 1}
      val (sc0, sc1) = (math.abs(r00), math.abs(r11))
      require(sc0 > 1e-12 && sc1 > 1e-12, "singular linear part")
      val (d0, d1) = (math.signum(r00), math.signum(r11))
      // adjusted shear = shear * d: upper triangular, unit diagonal
      val shear01 = (r01 / sc0) * d1
      // adjusted rotation = d * Q * d (det 1, orthogonal)
      val rot = Array(c * d0 * d0, -s * d0 * d1, s * d1 * d0, c * d1 * d1)
      // adjusted qq = d (the reflection part; qq = I for a proper-rotation Q)
      val inversion = ScaleT(Seq(d0, d1), axes)
      val rotation = AffineT(Matrix(3, 3, Array(
        rot(0), rot(1), 0.0, rot(2), rot(3), 0.0, 0.0, 0.0, 1.0)), axes, axes)
      val shear = AffineT(Matrix(3, 3, Array(
        1.0, shear01, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)), axes, axes)
      val scale = ScaleT(Seq(sc0, sc1), axes)
      SequenceT(List(inversion, rotation, shear, scale, TranslationT(translation, axes)))
    }
    val check = seq.toAffineMatrix(axes, axes)
    require(check.sameAs(mm, 1e-8),
      s"decomposition does not recompose: $check vs $mm")
    seq
  }
}
