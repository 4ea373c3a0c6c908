package graft

/** SURVEY §5.4: every declared query executed twice, results compared —
  * catches nondeterministic collect/dropDuplicates/float-order bugs
  * before the driver's hash compare does. */
class DeterminismSpec extends SparkTestBase {
  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name is run-to-run deterministic") {
      val a = fn(spark, sf).collect().map(_.toString).toSeq
      val b = fn(spark, sf).collect().map(_.toString).toSeq
      assert(a == b, s"$name differs between runs")
    }
  }

  // Partition-count invariance — the cross-scale half of the policy,
  // checked in-process: a different shuffle width changes partial-agg
  // merge ORDER, which is exactly what DESIGN §2's exact-accumulation
  // rules (DECIMAL sums, fixed-point integers, struct-extreme argmax)
  // must be immune to. Representative keys cover each exact-arithmetic
  // family: decimal money sums, second moments, fixed-point iterative
  // PageRank, the partial-merge rollup, a float-derived round6, and
  // (r11) exact percentile buffers (agg_mad), rank-tie algebra under
  // the two-level prefix-sum rank (agg_gini, r12 form), iterative
  // min-label propagation (graph_cc), integer-division scoring
  // (search_bm25), and (r12) the iterated argmax-merge chain
  // (pipe_bpe_apply: 4 BIGINT pair-count argmaxes, each feeding the
  // next step's input — any merge-order sensitivity compounds).
  for (key <- Seq("agg_groupby", "agg_stats_exact", "graph_pagerank",
      "etl_incremental_agg", "text_quality", "agg_mad", "agg_gini",
      "graph_cc", "search_bm25", "pipe_bpe_apply")) {
    test(s"$key is invariant to the shuffle partition count") {
      val conf = "spark.sql.shuffle.partitions"
      val before = spark.conf.get(conf)
      val at4 = SparkEntry.queries(key)(spark, sf)
        .collect().map(_.toString).toSeq
      try {
        spark.conf.set(conf, "7")
        val at7 = SparkEntry.queries(key)(spark, sf)
          .collect().map(_.toString).toSeq
        assert(at4 == at7, s"$key changed under a different shuffle width")
      } finally spark.conf.set(conf, before)
    }
  }
}
