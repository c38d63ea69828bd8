package graft.model

/** Coordinate transformations between named axis spaces.
  *
  * Re-expresses the reference's transformation algebra
  * (spatialdata `transformations/transformations.py:190-699`) as driver-side
  * linear algebra: every transform lowers to a homogeneous affine matrix of
  * shape (nOut+1) x (nIn+1) via [[Transform.toAffineMatrix]], and executors
  * only ever see the resulting matrix baked into generated column expressions
  * — never the transform objects themselves.
  *
  * Valid axis names are exactly `c, z, y, x` (reference `models/_utils.py:25-28`).
  */
sealed trait Transform extends Serializable {

  /** Homogeneous affine matrix mapping `inputAxes` -> `outputAxes`.
    * Row-major, (outputAxes.size + 1) rows x (inputAxes.size + 1) cols; the
    * last row is [0,...,0,1]. Mirrors `BaseTransformation.to_affine_matrix`
    * (transformations.py:534-567): axes untouched by the transform pass
    * through when the name matches on both sides, contribute 0 otherwise.
    */
  def toAffineMatrix(inputAxes: Seq[String], outputAxes: Seq[String]): Matrix

  /** Exact inverse transform (transformations.py per-class `inverse`). */
  def inverse: Transform

  /** Axis names this transform constrains (empty = passes any axes). */
  def definedAxes: Set[String]
}

object Transform {
  val ValidAxes: Seq[String] = Seq("c", "z", "y", "x")

  def requireValidAxes(axes: Seq[String]): Unit = {
    require(axes.nonEmpty && axes.distinct == axes,
      s"axes must be non-empty and unique, got $axes")
    val bad = axes.filterNot(ValidAxes.contains)
    require(bad.isEmpty, s"invalid axis names $bad; valid: $ValidAxes")
  }

  /** Compose a chain: `Sequence(a, b)` applies `a` first then `b`
    * (matches the reference's `Sequence` ordering, transformations.py:626).
    */
  def sequence(ts: Transform*): Transform = SequenceT(ts.toList)
}

/** Dense row-major matrix just big enough for 3x3/4x4/5x5 homogeneous math. */
final case class Matrix(rows: Int, cols: Int, data: Array[Double]) {
  require(data.length == rows * cols, s"bad matrix shape $rows x $cols")

  def apply(r: Int, c: Int): Double = data(r * cols + c)

  def *(other: Matrix): Matrix = {
    require(cols == other.rows, s"dim mismatch: $rows x $cols * ${other.rows} x ${other.cols}")
    val out = new Array[Double](rows * other.cols)
    var i = 0
    while (i < rows) {
      var k = 0
      while (k < cols) {
        val a = data(i * cols + k)
        if (a != 0.0) {
          var j = 0
          while (j < other.cols) {
            out(i * other.cols + j) += a * other.data(k * other.cols + j)
            j += 1
          }
        }
        k += 1
      }
      i += 1
    }
    Matrix(rows, other.cols, out)
  }

  /** Gauss–Jordan inverse (square, small n). */
  def inverseMatrix: Matrix = {
    require(rows == cols, "inverse of non-square matrix")
    val n = rows
    val a = Array.tabulate(n, 2 * n) { (i, j) =>
      if (j < n) apply(i, j) else if (j - n == i) 1.0 else 0.0
    }
    var col = 0
    while (col < n) {
      var piv = col
      var best = math.abs(a(col)(col))
      var r = col + 1
      while (r < n) {
        if (math.abs(a(r)(col)) > best) { best = math.abs(a(r)(col)); piv = r }
        r += 1
      }
      require(best > 1e-12, s"singular matrix (pivot $col)")
      if (piv != col) { val tmp = a(piv); a(piv) = a(col); a(col) = tmp }
      val p = a(col)(col)
      var j = 0
      while (j < 2 * n) { a(col)(j) /= p; j += 1 }
      r = 0
      while (r < n) {
        if (r != col) {
          val f = a(r)(col)
          if (f != 0.0) {
            var j2 = 0
            while (j2 < 2 * n) { a(r)(j2) -= f * a(col)(j2); j2 += 1 }
          }
        }
        r += 1
      }
      col += 1
    }
    Matrix(n, n, Array.tabulate(n * n)(i => a(i / n)(i % n + n)))
  }

  def sameAs(other: Matrix, tol: Double = 1e-9): Boolean =
    rows == other.rows && cols == other.cols &&
      data.zip(other.data).forall { case (x, y) => math.abs(x - y) <= tol }

  override def toString: String =
    (0 until rows).map(r => (0 until cols).map(c => apply(r, c)).mkString("[", ", ", "]"))
      .mkString("Matrix(", "; ", ")")
}

object Matrix {
  def identity(n: Int): Matrix =
    Matrix(n, n, Array.tabulate(n * n)(i => if (i / n == i % n) 1.0 else 0.0))

  /** Build the pass-through matrix between axis spaces: out(i)=in(j) where
    * names match, else 0 (the reference's axis-alignment logic for
    * `Identity`, transformations.py:190-239).
    */
  def passThrough(inputAxes: Seq[String], outputAxes: Seq[String]): Matrix = {
    val nIn = inputAxes.size
    val nOut = outputAxes.size
    val data = new Array[Double]((nOut + 1) * (nIn + 1))
    outputAxes.zipWithIndex.foreach { case (ax, i) =>
      val j = inputAxes.indexOf(ax)
      if (j >= 0) data(i * (nIn + 1) + j) = 1.0
    }
    data((nOut) * (nIn + 1) + nIn) = 1.0
    Matrix(nOut + 1, nIn + 1, data)
  }
}

/** Identity (transformations.py:190). */
case object IdentityT extends Transform {
  def toAffineMatrix(inputAxes: Seq[String], outputAxes: Seq[String]): Matrix =
    Matrix.passThrough(inputAxes, outputAxes)
  def inverse: Transform = this
  def definedAxes: Set[String] = Set.empty
}

/** Axis permutation/renaming: `mapAxis(outputAxis) = inputAxis`
  * (transformations.py:242-340).
  */
final case class MapAxisT(mapAxis: Map[String, String]) extends Transform {
  def toAffineMatrix(inputAxes: Seq[String], outputAxes: Seq[String]): Matrix = {
    val nIn = inputAxes.size
    val nOut = outputAxes.size
    val data = new Array[Double]((nOut + 1) * (nIn + 1))
    outputAxes.zipWithIndex.foreach { case (ax, i) =>
      val src = mapAxis.getOrElse(ax, ax)
      val j = inputAxes.indexOf(src)
      if (j >= 0) data(i * (nIn + 1) + j) = 1.0
    }
    data(nOut * (nIn + 1) + nIn) = 1.0
    Matrix(nOut + 1, nIn + 1, data)
  }
  def inverse: Transform = {
    require(mapAxis.values.toSet.size == mapAxis.size,
      s"MapAxis not invertible: $mapAxis")
    MapAxisT(mapAxis.map(_.swap))
  }
  def definedAxes: Set[String] = mapAxis.keySet ++ mapAxis.values
}

/** Per-axis translation (transformations.py:343-427). */
final case class TranslationT(translation: Seq[Double], axes: Seq[String]) extends Transform {
  require(translation.size == axes.size, "translation/axes size mismatch")
  Transform.requireValidAxes(axes)
  private val byAxis = axes.zip(translation).toMap

  def toAffineMatrix(inputAxes: Seq[String], outputAxes: Seq[String]): Matrix = {
    val base = Matrix.passThrough(inputAxes, outputAxes)
    val nIn = inputAxes.size
    outputAxes.zipWithIndex.foreach { case (ax, i) =>
      byAxis.get(ax).foreach(t => base.data(i * (nIn + 1) + nIn) = t)
    }
    base
  }
  def inverse: Transform = TranslationT(translation.map(-_), axes)
  def definedAxes: Set[String] = axes.toSet
}

/** Per-axis scaling (transformations.py:430-506). */
final case class ScaleT(scale: Seq[Double], axes: Seq[String]) extends Transform {
  require(scale.size == axes.size, "scale/axes size mismatch")
  Transform.requireValidAxes(axes)
  private val byAxis = axes.zip(scale).toMap

  def toAffineMatrix(inputAxes: Seq[String], outputAxes: Seq[String]): Matrix = {
    val base = Matrix.passThrough(inputAxes, outputAxes)
    val nIn = inputAxes.size
    outputAxes.zipWithIndex.foreach { case (ax, i) =>
      val j = inputAxes.indexOf(ax)
      if (j >= 0) byAxis.get(ax).foreach(s => base.data(i * (nIn + 1) + j) = s)
    }
    base
  }
  def inverse: Transform = ScaleT(scale.map(1.0 / _), axes)
  def definedAxes: Set[String] = axes.toSet

  /** True if this is a pure (axis-aligned) scaling — enables the bbox-query
    * fast path (reference spatial_query.py:324-326).
    */
  def isDiagonal: Boolean = true
}

/** General affine with named input/output axes (transformations.py:509-623).
  * `matrix` is homogeneous, (outputAxes.size+1) x (inputAxes.size+1), row-major.
  */
final case class AffineT(matrix: Matrix, inputAxes: Seq[String], outputAxes: Seq[String])
    extends Transform {
  Transform.requireValidAxes(inputAxes)
  Transform.requireValidAxes(outputAxes)
  require(matrix.rows == outputAxes.size + 1 && matrix.cols == inputAxes.size + 1,
    s"affine matrix shape ${matrix.rows}x${matrix.cols} does not match axes")

  def toAffineMatrix(reqIn: Seq[String], reqOut: Seq[String]): Matrix = {
    // Align: reqIn -> inputAxes (pass-through), then matrix, then
    // outputAxes -> reqOut (pass-through); axes absent from this affine but
    // present in both requested spaces pass through unchanged
    // (transformations.py:534-567).
    val toIn = Matrix.passThrough(reqIn, inputAxes)
    val fromOut = Matrix.passThrough(outputAxes, reqOut)
    val core = fromOut * (matrix * toIn)
    // Restore pass-through for axes not handled by this affine at all.
    val untouched = reqOut.zipWithIndex.filter { case (ax, _) =>
      !outputAxes.contains(ax) && !inputAxes.contains(ax) && reqIn.contains(ax)
    }
    if (untouched.isEmpty) core
    else {
      val d = core.data.clone()
      val nIn = reqIn.size
      untouched.foreach { case (ax, i) =>
        val j = reqIn.indexOf(ax)
        d(i * (nIn + 1) + j) = 1.0
      }
      Matrix(core.rows, core.cols, d)
    }
  }

  def inverse: Transform =
    AffineT(matrix.inverseMatrix, outputAxes, inputAxes)
  def definedAxes: Set[String] = inputAxes.toSet ++ outputAxes.toSet
}

object AffineT {
  /** Convenience: square affine on `axes` from a flat row-major homogeneous
    * matrix of shape (n+1)x(n+1).
    */
  def square(flat: Seq[Double], axes: Seq[String]): AffineT = {
    val n = axes.size + 1
    AffineT(Matrix(n, n, flat.toArray), axes, axes)
  }
}

/** Composition: applies left-to-right (transformations.py:626-699). */
final case class SequenceT(transforms: List[Transform]) extends Transform {
  require(transforms.nonEmpty, "empty Sequence")

  def toAffineMatrix(inputAxes: Seq[String], outputAxes: Seq[String]): Matrix = {
    // Matrix product in reverse application order; intermediate axis space is
    // the union of requested output + each transform's defined axes, mirroring
    // `Sequence.to_affine_matrix`'s axis threading (transformations.py:635-699).
    val mid = Transform.ValidAxes.filter(a =>
      inputAxes.contains(a) || outputAxes.contains(a) ||
        transforms.exists(_.definedAxes.contains(a)))
    var acc = Matrix.passThrough(inputAxes, mid)
    transforms.foreach { t => acc = t.toAffineMatrix(mid, mid) * acc }
    Matrix.passThrough(mid, outputAxes) * acc
  }
  def inverse: Transform = SequenceT(transforms.reverse.map(_.inverse))
  def definedAxes: Set[String] = transforms.flatMap(_.definedAxes).toSet
}
