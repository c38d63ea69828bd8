package graft.functions

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, GlobalLimit, Join, LocalLimit, LogicalPlan, OneRowRelation, Project, Window}
import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression, IntegerLiteral, ScalaUDF}
import org.apache.spark.sql.catalyst.rules.Rule

/** Session-enforced scale guardrails — [[graft.tools.PlanLint]]'s CI
  * pre-flight productized as an injected Catalyst OPTIMIZER RULE, so a
  * shared-cluster session can refuse the query shapes that melt down
  * at 100 TB *at planning time*, before a single task launches:
  *
  *   - a WINDOW with an empty partition spec (every row through ONE
  *     reducer — the shape [[graft.ops.Ranking.globalRank]] exists to
  *     replace);
  *   - a CROSS join (row-count product);
  *   - a conditioned join with NO equi-key between two multi-row sides
  *     (plans as BroadcastNestedLoopJoin — per-probe-row full scans of
  *     the build side);
  *   - a per-row ScalaUDF anywhere in the plan (opaque to codegen,
  *     pushdown and pruning).
  *
  * Deploy with `spark.sql.extensions=graft.functions.GraftGuardrails`
  * (composes with [[GraftSqlExtensions]] — the config takes a
  * comma-separated list). Mode via `spark.graft.guardrails`:
  * `fail` (default for an injected session — you asked for guardrails),
  * `warn` (log and pass), `off`. The rule only INSPECTS — it never
  * rewrites, so semantics are untouchable by construction.
  *
  * Engine note: graft's own operators plan clean under `fail` mode —
  * kernels are codegen `StaticInvoke`s (never ScalaUDFs), and the one
  * deliberate non-equi broadcast join ([[graft.pipeline.ErIndex]]'s
  * manifest routing) is exempted by its explicit `broadcast()` hint (the
  * author's bounded-side assertion; see `hasBroadcastHint`). A few
  * operators use global windows that are BOUNDED by construction (the
  * aucRoc/spearman distinct-value walks — ≤ 1e6 rows on the snapped grid
  * regardless of corpus size; percentileRank's ≤-bins cum table).
  * Sessions running those through SQL should use `warn`, or scope `off`
  * around the call — the guardrail cannot see cardinality bounds, only
  * shapes, and says so in its message.
  */
class GraftGuardrails extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => GuardrailRule)
}

object GuardrailRule extends Rule[LogicalPlan] with Logging {

  private def mode: String =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.guardrails", "fail")

  /** Provably ≤1-row at the plan level: a grouping-free Aggregate (the
    * broadcast-stats idiom — cross-joining a 1-row frame is a projection,
    * not a product), LIMIT 1, or the literal one-row relation; looking
    * through row-preserving-or-shrinking wrappers.
    */
  private def boundedOne(p: LogicalPlan): Boolean = p match {
    case a: Aggregate => a.groupingExpressions.isEmpty
    case _: OneRowRelation => true
    // ConvertToLocalRelation folds LIMIT 1 over local data into the
    // relation itself — the row count is right there
    case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
      l.data.length <= 1
    case g: GlobalLimit => g.limitExpr match {
      case IntegerLiteral(n) => n <= 1
      case _ => boundedOne(g.child)
    }
    case l: LocalLimit => l.limitExpr match {
      case IntegerLiteral(n) => n <= 1
      case _ => boundedOne(l.child)
    }
    case pr: Project => boundedOne(pr.child)
    case f: Filter => boundedOne(f.child)
    case other => other.children.size == 1 && boundedOne(other.children.head)
  }

  /** An EXPLICIT broadcast hint on a join side is the author's signed
    * assertion that the side is small enough to ship to every executor —
    * the exact cardinality bound the nested-loop check cannot see. A
    * hinted BNLJ is therefore a deliberate bounded-side scan (graft's
    * own `ErIndex.routeToRanges` joins rows `>=` a broadcast O(ranges)
    * manifest this way), not an accident — exempt it. Only the explicit
    * hint qualifies: a side the PLANNER would auto-broadcast from size
    * stats carries no such assertion and still trips the check.
    */
  private def hasBroadcastHint(j: Join): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.BROADCAST
    j.hint.leftHint.exists(_.strategy.contains(BROADCAST)) ||
      j.hint.rightHint.exists(_.strategy.contains(BROADCAST))
  }

  /** Does the join condition contain at least one equality whose sides
    * reference opposite children? That is what lets the planner pick a
    * hash/sort-merge strategy; without one, a conditioned join between
    * two multi-row sides plans as BroadcastNestedLoopJoin — every probe
    * row scans the entire build side.
    */
  private def hasEquiKeys(j: Join): Boolean = {
    val left = j.left.outputSet
    val right = j.right.outputSet
    def opposite(a: Expression, b: Expression): Boolean =
      a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(left) && b.references.subsetOf(right)) ||
          (a.references.subsetOf(right) && b.references.subsetOf(left)))
    // only TOP-LEVEL CONJUNCTS count: an equality buried inside an OR
    // (`a.id = b.id OR a.x < b.x`) is not extractable as a hash-join key
    // — ExtractEquiJoinKeys splits conjunctions the same way
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    j.condition.exists(c => conjuncts(c).exists {
      case EqualTo(a, b) => opposite(a, b)
      case EqualNullSafe(a, b) => opposite(a, b)
      case _ => false
    })
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val m = mode
    if (m == "off") return plan
    val findings = scala.collection.mutable.ArrayBuffer.empty[String]
    plan.foreach {
      case w: Window if w.partitionSpec.isEmpty && w.windowExpressions.nonEmpty =>
        findings += ("global-window: every row funnels through one reducer " +
          s"(${w.windowExpressions.map(_.sql).mkString(", ")}); partition it, " +
          "or use graft.ops.Ranking.globalRank for a global ordinal. If the " +
          "input is bounded by construction, set spark.graft.guardrails=warn")
      case j: Join if (j.joinType == Cross || j.condition.isEmpty) &&
          !boundedOne(j.left) && !boundedOne(j.right) =>
        findings += ("cross-join: row-count product " +
          s"(${j.joinType}); add an equi-condition (a provably 1-row side " +
          "— a grouping-free aggregate or LIMIT 1 — is exempt)")
      case j: Join if j.condition.isDefined && !hasEquiKeys(j) &&
          !boundedOne(j.left) && !boundedOne(j.right) &&
          !hasBroadcastHint(j) =>
        findings += ("nested-loop-join: no equi-key in the join condition " +
          s"(${j.condition.get.sql}) — this plans as BroadcastNestedLoopJoin, " +
          "every probe row scanning the whole build side; add an " +
          "equi-conjunct (band a range predicate, bucket a key). An " +
          "inequality join against a side bounded by construction (e.g. " +
          "an O(ranges) manifest) is exempt when that side carries an " +
          "EXPLICIT broadcast() hint — the author's bounded-side " +
          "assertion the rule itself cannot derive from shape")
      case p if p.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF])) =>
        val names = p.expressions.flatMap(_.collect {
          case u: ScalaUDF => u.udfName.getOrElse("anonymous")
        }).distinct
        findings += (s"scala-udf: opaque per-row function(s) " +
          s"(${names.mkString(", ")}) block whole-stage codegen, predicate " +
          "pushdown and column pruning on the hot path — use " +
          "org.apache.spark.sql.functions or a native Catalyst expression " +
          "(graft's own kernels are StaticInvoke — see graft.geom.st, " +
          "graft.model.ShapeKernel). User UDFs that must stay should run " +
          "under spark.graft.guardrails=warn")
      case _ =>
    }
    if (findings.nonEmpty) {
      val msg = s"graft guardrails: ${findings.mkString("; ")}"
      if (m == "warn") logWarning(msg)
      else throw new IllegalStateException(msg)
    }
    plan
  }
}
