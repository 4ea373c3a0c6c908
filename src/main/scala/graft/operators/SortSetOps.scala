package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._

/** SURVEY §2.6 sort / limit / pagination / set operations.
  *
  * Scale notes: global sorts use Spark's range-partitioned sort (sampled
  * boundaries, no single-node sort); `orderBy ... limit` collapses to
  * TakeOrderedAndProject (per-partition top-k + merge, no full sort).
  * Set ops are hash-based distinct/except/intersect — one shuffle each.
  */
object SortSetOps {
  private def ordersProjA(s: SparkSession, d: String) =
    t(s, d, "orders").where(col("o_orderstatus") === "O")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))

  private def ordersProjB(s: SparkSession, d: String) =
    t(s, d, "orders").where(col("o_totalprice") > 50000)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))

  private val projASql =
    "SELECT o_orderkey AS k, o_totalprice AS v FROM orders WHERE o_orderstatus = 'O'"
  private val projBSql =
    "SELECT o_orderkey AS k, o_totalprice AS v FROM orders WHERE o_totalprice > 50000"

  val queries: Map[String, QFn] = Map(
    "sort_multi" -> ((s: SparkSession, d: String) =>
      t(s, d, "orders")
        .withColumn("np", expr("nullif(o_orderpriority, '1-URGENT')"))
        .orderBy(col("np").desc_nulls_first, col("o_totalprice").desc,
          col("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          when(col("np").isNull, 1).otherwise(0).as("urgent"))
        .limit(500)),

    "limit_offset" -> ((s: SparkSession, d: String) =>
      t(s, d, "orders").orderBy("o_orderkey").offset(100).limit(50)),

    "set_union_all" -> ((s: SparkSession, d: String) =>
      ordersProjA(s, d).unionByName(ordersProjB(s, d)).orderBy("k", "v")),

    // UNION DISTINCT of two subqueries over the SAME table — rewritten
    // to one OR-filtered scan + distinct (a rewrite Catalyst does not do
    // itself): result-identical because both branches project the same
    // columns of the same rows, and it halves the scan cost the naive
    // two-branch union pays (r3 bench: the two-scan form was the one
    // nominal baseline-ratio breach)
    "set_union_distinct" -> ((s: SparkSession, d: String) =>
      t(s, d, "orders")
        .where(col("o_orderstatus") === "O" || col("o_totalprice") > 50000)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
        .distinct()
        .orderBy("k", "v")),

    "set_intersect" -> ((s: SparkSession, d: String) =>
      t(s, d, "lineitem").select(col("l_partkey").as("k"))
        .intersect(t(s, d, "part").select(col("p_partkey").as("k")))
        .orderBy("k")),

    "set_except" -> ((s: SparkSession, d: String) =>
      t(s, d, "part").select(col("p_partkey").as("k"))
        .except(t(s, d, "lineitem").select(col("l_partkey").as("k")))
        .orderBy("k")),

    // Bag (multiset) semantics: duplicates survive with multiplicity
    // max(m-n, 0) / min(m, n) — the other half of the set-op family.
    // Summarized per key so the output stays total-order sortable.
    "set_except_all" -> ((s: SparkSession, d: String) =>
      t(s, d, "lineitem").select(col("l_partkey").as("k"))
        .exceptAll(t(s, d, "orders")
          .select((col("o_orderkey") % 20000).as("k")))
        .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
        .orderBy("k")),

    "set_intersect_all" -> ((s: SparkSession, d: String) =>
      t(s, d, "lineitem").select(col("l_partkey").as("k"))
        .intersectAll(t(s, d, "orders")
          .select((col("o_orderkey") % 20000).as("k")))
        .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
        .orderBy("k")))

  val oracle: Map[String, String] = Map(
    "sort_multi" ->
      ("SELECT o_orderkey, o_orderstatus, o_totalprice, " +
        "CASE WHEN nullif(o_orderpriority, '1-URGENT') IS NULL THEN 1 ELSE 0 END AS urgent " +
        "FROM orders ORDER BY nullif(o_orderpriority, '1-URGENT') DESC NULLS FIRST, " +
        "o_totalprice DESC, o_orderkey LIMIT 500"),
    "limit_offset" ->
      "SELECT * FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100",
    "set_union_all" ->
      s"($projASql) UNION ALL ($projBSql) ORDER BY k, v",
    "set_union_distinct" ->
      s"($projASql) UNION ($projBSql) ORDER BY k, v",
    "set_intersect" ->
      ("SELECT l_partkey AS k FROM lineitem INTERSECT " +
        "SELECT p_partkey AS k FROM part ORDER BY k"),
    "set_except" ->
      ("SELECT p_partkey AS k FROM part EXCEPT " +
        "SELECT l_partkey AS k FROM lineitem ORDER BY k"),
    "set_except_all" ->
      ("SELECT k, count(*) AS cnt FROM " +
        "(SELECT l_partkey AS k FROM lineitem EXCEPT ALL " +
        "SELECT o_orderkey % 20000 AS k FROM orders) " +
        "GROUP BY k ORDER BY k"),
    "set_intersect_all" ->
      ("SELECT k, count(*) AS cnt FROM " +
        "(SELECT l_partkey AS k FROM lineitem INTERSECT ALL " +
        "SELECT o_orderkey % 20000 AS k FROM orders) " +
        "GROUP BY k ORDER BY k"))
}
