package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (SURVEY §4 recipe c — the rung below custom
  * Expressions): top-k rows per group as a first-class physical operator,
  * planned as TWO execs around the exchange:
  *
  *   TopKPerGroupExec(final)            exact per-group top-k
  *     ShuffleExchange(hash(group))     carries ≤ k rows per (group ×
  *     TopKPerGroupExec(partial)          input partition), not the table
  *       <child>
  *
  * This is what the window-function formulation (`row_number() ≤ k`)
  * cannot do: WindowExec shuffles and sorts EVERY input row, while the
  * partial pass bounds shuffle volume by k·groups·partitions — at 100 TB
  * with millions of rows per group the difference is the job. The typed
  * Aggregator (`agg_topk_heap`) achieves the same dataflow for encoder-
  * friendly payloads; this operator does it for arbitrary row schemas at
  * the InternalRow/UnsafeRow level with no serialization detour.
  *
  * Registered via `spark.experimental.extraStrategies` (see
  * [[graft.GraftExtensions.installStrategies]]); constructed from the
  * public API by [[graft.operators.GraftOps.topKPerGroup]].
  */
case class TopKPerGroupPlan(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerGroupPlan → partial + final execs.
  * EnsureRequirements inserts the hash exchange between them because the
  * final exec demands ClusteredDistribution while the partial does not.
  *
  * Group keys are float-normalized (-0.0→0.0, canonical NaN) the same
  * way Catalyst's NormalizeFloatingNumbers rule does for Aggregate/
  * Window — that rule does not visit custom nodes, and without it 0.0
  * and -0.0 would both hash to different exchange partitions and land
  * in distinct heap-map entries. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child) =>
      val ng = g.map(org.apache.spark.sql.GraftBridge.normalizeFloats)
      TopKPerGroupExec(ng, o, k, partial = false,
        TopKPerGroupExec(ng, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  /** Row-pruning only — partitioning is untouched, and advertising that
    * lets downstream group-clustered operators (e.g. a window over the
    * same keys) reuse the exchange instead of inserting a second one. */
  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** Memory bound: the per-partition heap map holds ≤ k rows per
    * DISTINCT group key seen in that partition, on-heap, with no spill
    * or sort-based fallback (ObjectHashAggregateExec has one; this
    * operator targets many-rows-per-group inputs where groups ≪ rows).
    * Callers with partition-level group cardinality approaching the
    * row count should use the window formulation instead — documented
    * on [[graft.operators.GraftOps.topKPerGroup]]. */
  override protected def doExecute(): RDD[InternalRow] = {
    val gExprs = groupExprs
    val ord = ordering
    val out = child.output
    val limit = k
    val emitSorted = !partial
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(gExprs, out)
      // lt(a, b) == "a ranks strictly better than b"
      val rowOrd = RowOrdering.create(ord, out)
      // max-heap per group under rowOrd: head is the WORST kept row, so
      // a full heap admits a new row by evicting its head
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty(rowOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (rowOrd.lt(row, heap.head)) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      val groups = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var current: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!current.hasNext && groups.hasNext) {
            val rows = groups.next().toArray
            current =
              if (emitSorted) rows.sorted(rowOrd).iterator else rows.iterator
          }
          current.hasNext
        }
        override def next(): InternalRow = current.next()
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
