package graft.ops

import graft.plans.{TopKPerGroupLogical, TopKPerGroupStrategy}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}

/** Per-group top-k through the custom Catalyst operator
  * ([[graft.plans.TopKPerGroupLogical]]): partial bounded heaps per input
  * partition, a hash exchange carrying at most k rows per (group,
  * partition), a final per-group merge — where the window form
  * (`row_number` + filter) shuffles and sorts every row of every group.
  * See the plan-level scaladoc for the scale argument; TopKSpec pins the
  * partial→exchange→final plan shape and the window-form equivalence.
  */
object TopK {

  /** `orderBy` is (column, ascending) pairs and must be a TOTAL order
    * within a group up to full-row equality — compare-equal rows must be
    * interchangeable, or "the" top k is not well defined on any engine.
    * NULL ordering follows each direction's Spark default (NULLS FIRST
    * for ascending, NULLS LAST for descending).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(orderBy.nonEmpty, "TopK.perGroup: need at least one order column")
    val spark = df.sparkSession
    // idempotent runtime registration — the strategy is a stateless object
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies = cur :+ TopKPerGroupStrategy
    val lp = df.queryExecution.analyzed
    // resolve by name, refusing ambiguity loudly: after a join the analyzed
    // plan can carry two attributes with the same name, and silently binding
    // the first would rank by the wrong side's column
    def attr(n: String) = lp.output.filter(_.name == n) match {
      case Seq(a) => a
      case Seq() => throw new IllegalArgumentException(
        s"TopK.perGroup: no column '$n' in ${lp.output.map(_.name)}")
      case many => throw new IllegalArgumentException(
        s"TopK.perGroup: column '$n' is ambiguous (${many.size} attributes match); " +
          "alias the columns before calling")
    }
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark,
      TopKPerGroupLogical(groupCols.map(attr), order, k, lp))
  }
}
