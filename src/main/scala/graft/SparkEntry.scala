package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (the operator inventory)
  * and §7 (build plan). Every key below is one §2 row; every key with a
  * deterministic ANSI-SQL formulation also appears in [[oracleSql]] for
  * the driver's DuckDB hash-compare. The 9 ⊘ keys (agg_approx_distinct,
  * agg_approx_percentile, agg_hll_sketch, agg_cms_sketch, dedup_minhash,
  * knn_ann_srp, knn_ivf, knn_graph_ivf, stream_neardup — sketch/LSH/
  * IVF/stream internals differ across engines) are covered by in-repo
  * tests instead (SURVEY §5). text_fingerprint left the ⊘ set in r15:
  * its rolling hash is a closed-form polynomial mod 2⁶⁴, expressible
  * in DuckDB via HUGEINT arithmetic.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggOps.queries("agg_groupby")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ScanProjOps.queries ++ JoinOps.queries ++ AggOps.queries ++
      WindowOps.queries ++ SortSetOps.queries ++ FnOps.queries ++
      TextSimOps.queries ++ TimeOps.queries ++ UdxOps.queries ++
      MultimodalOps.queries ++ TextAnalysisOps.queries ++
      SimilarityOps.queries ++ EtlOps.queries ++ PipelineOps.queries ++
      GraphOps.queries ++ AnalyticsOps.queries ++ LayoutOps.queries ++
      SearchOps.queries ++ IngestOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (agg_approx_distinct, dedup_minhash — sketch/LSH internals differ
    * across engines; tested in-repo instead). */
  def oracleSql: Map[String, String] =
    ScanProjOps.oracle ++ JoinOps.oracle ++ AggOps.oracle ++
      WindowOps.oracle ++ SortSetOps.oracle ++ FnOps.oracle ++
      TextSimOps.oracle ++ TimeOps.oracle ++ UdxOps.oracle ++
      MultimodalOps.oracle ++ TextAnalysisOps.oracle ++
      SimilarityOps.oracle ++ EtlOps.oracle ++ PipelineOps.oracle ++
      GraphOps.oracle ++ AnalyticsOps.oracle ++ LayoutOps.oracle ++
      SearchOps.oracle ++ IngestOps.oracle
}
