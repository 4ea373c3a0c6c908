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
    * columns should form a total order for deterministic results. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(groupCols.nonEmpty,
      "groupCols must be non-empty (for a global top-k use orderBy().limit(k))")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    graft.GraftExtensions.installStrategies(df.sparkSession)
    val plan = GraftBridge.analyzed(df)
    def attr(n: String) = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"no column '$n' among ${plan.output.map(_.name).mkString(", ")}"))
    GraftBridge.ofRows(df.sparkSession,
      TopKPerGroupPlan(
        groupCols.map(attr),
        orderCols.map { case (n, asc) =>
          SortOrder(attr(n), if (asc) Ascending else Descending) },
        k, plan))
  }
}
