package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import graft.plans.TopKPerGroupPlan

/** Public entry points for the library's whole-operator extensions
  * (custom LogicalPlan + SparkStrategy + SparkPlan — SURVEY §4 recipe c). */
object GraftOps {
  /** Top-k rows per group under the given (column, ascending?) order,
    * executed by the two-phase [[graft.plans.TopKPerGroupExec]]: the
    * shuffle carries at most k rows per (group × input partition)
    * instead of every row the window formulation would move. Order
    * columns should form a total order for deterministic results.
    *
    * Memory bound: each pass holds one ≤k-row heap PER DISTINCT GROUP
    * seen in a partition — O(groups-per-partition × k × row size) —
    * and when that retained-row count exceeds
    * `spark.graft.topk.fallbackRows` (default 4M) the partition
    * switches to a spilling external sort on (group, order) and streams
    * first-k-per-group from the sorted run (the ObjectHashAggregateExec
    * discipline), so high group cardinality degrades to sort cost
    * instead of OOM. The `numSortFallbacks` SQL metric counts
    * partitions that switched. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(groupCols.nonEmpty,
      "groupCols must be non-empty (for a global top-k use orderBy().limit(k))")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    graft.GraftExtensions.installStrategies(df.sparkSession)
    val plan = GraftBridge.analyzed(df)
    // resolve with the session's resolver (honors spark.sql.caseSensitive)
    // and reject ambiguity instead of silently picking the first match
    val resolve = GraftBridge.resolver(df.sparkSession)
    def attr(n: String) = plan.output.filter(a => resolve(a.name, n)) match {
      case Seq(one) => one
      case Seq() => throw new IllegalArgumentException(
        s"no column '$n' among ${plan.output.map(_.name).mkString(", ")}")
      case many => throw new IllegalArgumentException(
        s"ambiguous column '$n' (${many.size} matches: " +
          s"${many.mkString(", ")}) — disambiguate upstream")
    }
    GraftBridge.ofRows(df.sparkSession,
      TopKPerGroupPlan(
        groupCols.map(attr),
        orderCols.map { case (n, asc) =>
          SortOrder(attr(n), if (asc) Ascending else Descending) },
        k, plan))
  }
}
