package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-group top-k as a WHOLE-OPERATOR Catalyst extension — the (c) rung
  * of the custom-operator ladder (compose > Expression > LogicalPlan +
  * Strategy + SparkPlan > mapPartitions): a logical node, a planner
  * strategy, and a physical operator pair registered through
  * `spark.experimental.extraStrategies` (see [[graft.ops.TopK.perGroup]]).
  *
  * Why not the window form? `row_number().over(partitionBy(g).orderBy(o))
  * <= k` shuffles EVERY row to its group's reducer and sorts whole
  * groups, so a skewed group pays its full size in network and sort
  * memory. This operator runs a bounded heap per (partition, group)
  * BEFORE the exchange — the map side emits at most k rows per group per
  * partition — then merges the survivors after a hash exchange on the
  * group keys. At 100 TB with k = 10 the shuffle carries
  * O(groups × partitions × k) rows instead of the corpus; the hottest
  * group costs k × partitions rows, not its cardinality. This is the
  * aggregate partial/final split applied to an order statistic the
  * built-in partial aggregation cannot express (TakeOrderedAndProject
  * does exactly this for the GLOBAL top-k; no built-in does it per key).
  *
  * Heap memory on the map side is bounded by distinct-groups-per-
  * partition × k rows — the same envelope a partial aggregation's hash
  * map holds for those groups' states.
  */
case class TopKPerGroupLogical(groupCols: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"TopKPerGroup: k must be >= 1, got $k")
  require(groupCols.nonEmpty, "TopKPerGroup: need at least one group column")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupLogical =
    copy(child = newChild)
}

/** Plans the logical node as partial-over-child, final-over-partial; the
  * final's [[ClusteredDistribution]] requirement makes EnsureRequirements
  * insert the hash exchange on the group keys (AQE-compatible — the
  * exchange is a normal shuffle it can coalesce).
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupLogical(g, o, k, child) =>
      val partial = TopKPerGroupExec(g, o, k, planLater(child), partial = true)
      TopKPerGroupExec(g, o, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

/** One heap pass: keep the first k rows of each group under `order`.
  * The same operator serves both phases — the partial runs on arbitrary
  * input splits (emitting ≤ k rows per group per partition), the final
  * requires group-clustered input and reduces each group's ≤ k×partitions
  * survivors to the true top k. Rows are buffered as copies (child rows
  * are reused mutable UnsafeRows); the per-group heap is a max-heap under
  * the retention order so its head is the worst retained row — an
  * incoming row replaces it only when strictly better, which is exact
  * because compare-equal rows within a group are identical in every
  * output column (the order is expected to be a total tiebreak, as any
  * deterministic top-k needs).
  *
  * Memory envelope: the PARTIAL phase flushes its heap map whenever the
  * buffered-row count exceeds [[TopKPerGroupExec.partialFlushRows]] —
  * emitting a flushed group's ≤ k rows early is correct because the final
  * phase re-reduces per group, so partial memory is bounded regardless of
  * group cardinality (the analogue of HashAggregateExec's sort-based
  * fallback, but cheaper: no sort needed, just emit-and-reset). The FINAL
  * phase holds distinct-groups-in-partition × k rows — the same envelope
  * as a final hash aggregation's state map — and does not spill; a
  * pathological groups×k that outgrows an executor needs a larger shuffle
  * partition count, exactly as final aggregation does.
  */
case class TopKPerGroupExec(groupCols: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan, partial: Boolean) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupCols) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val kL = k
    val g = groupCols
    val o = order
    val out = child.output
    val flushAt = if (partial) TopKPerGroupExec.partialFlushRows else Int.MaxValue
    child.execute().mapPartitions({ iter =>
      // generated projections/orderings are not serializable — built per
      // partition, exactly like SortExec/HashAggregateExec do
      val keyProj = UnsafeProjection.create(g, out)
      val ord = RowOrdering.create(o, out)
      val cmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      import scala.jdk.CollectionConverters._
      new Iterator[InternalRow] {
        private var drained: Iterator[InternalRow] = Iterator.empty
        // consume input until the row budget trips or input is exhausted,
        // then hand the buffered heaps to `drained`; partial mode may loop
        // (flush-and-reset), final mode's budget is unbounded so one pass
        private def refill(): Unit = {
          val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
          var buffered = 0
          while (iter.hasNext && buffered < flushAt) {
            val row = iter.next()
            val key = keyProj(row)
            var heap = heaps.get(key)
            if (heap == null) {
              heap = new java.util.PriorityQueue[InternalRow](kL, cmp)
              heaps.put(key.copy(), heap)
            }
            if (heap.size() < kL) { heap.add(row.copy()); buffered += 1 }
            else if (ord.compare(row, heap.peek()) < 0) {
              heap.poll()
              heap.add(row.copy())
            }
          }
          drained = heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
        }
        override def hasNext: Boolean =
          drained.hasNext || (iter.hasNext && { refill(); drained.hasNext })
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("TopKPerGroupExec")
          drained.next()
        }
      }
    }, preservesPartitioning = true)
  }
}

object TopKPerGroupExec {
  /** Partial-phase buffered-row budget before a flush-and-reset. 2^20 rows
    * of copied UnsafeRows (~100 MB at 100 B/row) — comfortably inside an
    * executor task's share while making flushes rare: a flush only costs
    * extra shuffle rows (≤ k per flushed group), never correctness.
    */
  val partialFlushRows: Int = 1 << 20
}
