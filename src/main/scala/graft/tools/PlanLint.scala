package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Scale-safety lints over a physical plan — the guardrails this repo's
  * specs pin by hand (no cartesian product, no corpus-wide window),
  * packaged as a library so a pipeline can assert them in CI before a
  * 100 TB run instead of discovering them as a 3 a.m. stage that never
  * finishes. [[lint]] returns findings; [[assertScaleSafe]] throws with
  * the offending node unless the rule is explicitly allowed (some plans
  * WANT a product — a broadcast 1-row stats frame, an eval-side exact
  * oracle — and the allowlist records that intent at the call site).
  *
  * Rules:
  *  - `cartesian-product`: CartesianProductExec — O(|L|·|R|) pairs.
  *  - `nested-loop-join`: BroadcastNestedLoopJoinExec — a non-equi or
  *    cross join; every probe row scans the whole broadcast side.
  *  - `global-window`: WindowExec with an empty partitionSpec — the
  *    entire dataset funnels through ONE task's sorted window.
  *
  * Plain `orderBy` (global SortExec) is deliberately NOT flagged: output
  * ordering is a range-partitioned parallel sort, not a single-task
  * funnel. AQE wrappers and query stages are traversed through.
  */
object PlanLint {

  final case class Finding(rule: String, node: String) {
    override def toString: String = s"[$rule] $node"
  }

  private def walk(p: SparkPlan, out: scala.collection.mutable.ArrayBuffer[Finding]): Unit = {
    p match {
      case c: CartesianProductExec =>
        out += Finding("cartesian-product", c.simpleStringWithNodeId())
      case b: BroadcastNestedLoopJoinExec =>
        out += Finding("nested-loop-join", b.simpleStringWithNodeId())
      case w: WindowExec if w.partitionSpec.isEmpty =>
        out += Finding("global-window", w.simpleStringWithNodeId())
      case _ =>
    }
    p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan, out)
      case q: QueryStageExec => walk(q.plan, out)
      case other => other.children.foreach(walk(_, out))
    }
  }

  /** All findings in `df`'s physical plan (empty = scale-safe). */
  def lint(df: DataFrame): Seq[Finding] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Finding]
    walk(df.queryExecution.executedPlan, out)
    out.toSeq
  }

  /** Throw unless every finding's rule is in `allowed`. The message names
    * the offending physical nodes — paste-able into a review.
    */
  def assertScaleSafe(df: DataFrame, allowed: Set[String] = Set.empty): Unit = {
    val bad = lint(df).filterNot(f => allowed.contains(f.rule))
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"plan is not scale-safe:\n${bad.mkString("\n")}")
  }
}
