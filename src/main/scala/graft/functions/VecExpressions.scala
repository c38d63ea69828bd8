package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions (with `doGenCode`) for the two hottest
  * vector folds — the (b) rung of the custom-operator ladder, applied
  * where it pays: `aggregate(zip_with(a, b, …))` is a HigherOrderFunction
  * chain, which is CodegenFallback (it breaks the whole-stage span and
  * evaluates interpreted) AND allocates an intermediate array per row.
  * Every ANN / k-means / PQ scoring path folds one of these two shapes
  * per candidate pair, so the fallback sat on the engine's hottest
  * per-row loop. These compile to a primitive `for` loop over the two
  * ArrayData buffers inside whole-stage codegen — no allocation, no
  * virtual calls.
  *
  * Accumulation is LEFT-TO-RIGHT from 0.0 with the identical per-element
  * arithmetic of the folds they replace, so results are bit-identical —
  * the whole gate registry re-verified unchanged when the call sites
  * switched. Width mismatches throw (zip_with would silently null-pad),
  * and so does a null ELEMENT inside either array: parquet-cast
  * array<double> is containsNull=true, and `ArrayData.getDouble` on a
  * null slot silently reads 0.0 — a wrong number, not an error. The
  * folds these replace propagated NULL; here a null element is refused
  * loudly (engine convention), since no legitimate embedding has one.
  */
abstract class VecFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // no implicit casts: every call site casts to array<double> explicitly
  // (the engine-wide convention), so a type mismatch is a bug to refuse
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<double> inputs, got ($l, $r)")
    }

  /** Per-element term in Java-source form, over element vars `x` and `y`. */
  protected def termJava(x: String, y: String): String
  protected def termScala(x: Double, y: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: vector widths differ ($n vs ${y.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i))
        throw new IllegalArgumentException(
          s"$prettyName: null element at index $i (vectors must be dense)")
      s += termScala(x.getDouble(i), y.getDouble(i)); i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException("$prettyName: vector widths differ ("
         |    + $n + " vs " + $b.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    throw new IllegalArgumentException("$prettyName: null element at index "
         |      + $i + " (vectors must be dense)");
         |  }
         |  final double $x = $a.getDouble($i);
         |  final double $y = $b.getDouble($i);
         |  $s += ${termJava(x, y)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ — the dot product (and, as `VecDot(v, v)`, the squared norm). */
case class VecDot(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "graft_vec_dot"
  override protected def termJava(x: String, y: String): String = s"$x * $y"
  override protected def termScala(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Σ (aᵢ−bᵢ)² — the squared euclidean distance. */
case class VecDist2(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "graft_vec_dist2"
  override protected def termJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def termScala(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDist2 =
    copy(left = l, right = r)
}
