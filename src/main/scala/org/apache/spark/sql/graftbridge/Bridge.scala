package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.DataType

/** Minimal bridge into `private[sql]` surface: Column <-> Expression and a
  * `StaticInvoke` builder so graft's spatial functions compile to plain
  * static calls inside whole-stage codegen.
  */
object Bridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Integer division (SQL `div`) — `/` on long columns is double division
    * and loses low digits at int64 magnitudes.
    */
  def integralDivide(a: Column, b: Column): Column =
    ExpressionUtils.column(new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Rebuild a DataFrame from a logical plan (Dataset.ofRows is
    * private[sql]) — used by Bench to drop the oracle-only top-level sort.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Codegen-friendly static method call: `clazz.fn(args...)`. */
  def staticInvoke(
      clazz: Class[_],
      dataType: DataType,
      fn: String,
      args: Seq[Column],
      inputTypes: Seq[DataType],
      returnNullable: Boolean): Column =
    ExpressionUtils.column(StaticInvoke(
      clazz, dataType, fn,
      args.map(ExpressionUtils.expression),
      inputTypes,
      propagateNull = true,
      returnNullable = returnNullable))
}
