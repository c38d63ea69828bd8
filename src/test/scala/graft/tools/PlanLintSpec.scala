package graft.tools

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PlanLint: the packaged form of the plan guardrails the operator specs
  * pin by hand.
  */
class PlanLintSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val a = (0 until 100).map(i => (i.toLong, i % 7)).toDF("id", "g")
  private lazy val b = (0 until 50).map(i => (i.toLong, i % 5)).toDF("id2", "h")

  test("cartesian product and nested-loop join are flagged") {
    val cross = a.crossJoin(b)
    assert(PlanLint.lint(cross).exists(_.rule == "cartesian-product") ||
      PlanLint.lint(cross).exists(_.rule == "nested-loop-join"),
      PlanLint.lint(cross).mkString(","))
    val theta = a.join(b, col("id") < col("id2"))
    assert(PlanLint.lint(theta).exists(_.rule == "nested-loop-join"),
      PlanLint.lint(theta).mkString(","))
    intercept[IllegalStateException] { PlanLint.assertScaleSafe(theta) }
  }

  test("a global window is flagged; a keyed window and keyed join are not") {
    val global = a.withColumn("rn", row_number().over(Window.orderBy(col("id"))))
    assert(PlanLint.lint(global).exists(_.rule == "global-window"))
    val keyed = a.withColumn("rn",
      row_number().over(Window.partitionBy(col("g")).orderBy(col("id"))))
      .join(b, col("g") === col("h"))
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .orderBy(col("g")) // global ORDER BY must NOT be flagged
    assert(PlanLint.lint(keyed).isEmpty, PlanLint.lint(keyed).mkString(","))
    PlanLint.assertScaleSafe(keyed)
  }

  test("the allowlist records intentional products at the call site") {
    val cross = a.crossJoin(broadcast(b.limit(1)))
    PlanLint.assertScaleSafe(cross,
      allowed = Set("cartesian-product", "nested-loop-join"))
    intercept[IllegalStateException] { PlanLint.assertScaleSafe(cross) }
  }
}
