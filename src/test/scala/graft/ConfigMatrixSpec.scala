package graft

/** Plan-strategy independence (r10): a 1000-executor deployment will
  * plan these queries differently than local[4] — AQE re-plans at
  * runtime, broadcast thresholds differ, codegen falls back — and the
  * determinism contract says the RESULT may not care. This spec
  * re-runs representative shuffle/join-heavy keys under adversarial
  * session configs and requires byte-identical results:
  *  - AQE off (no runtime re-planning, no coalesced shuffles)
  *  - broadcast joins disabled entirely (every join becomes a shuffle
  *    join — the forced-fallback path PlanSpec asserts plans cleanly)
  */
class ConfigMatrixSpec extends SparkTestBase {
  private val keys = Seq("join_multiway", "join_inner_equi",
    "join_skew_salted", "agg_groupby", "win_topk_physical",
    "sim_jaccard_pairs", "text_lm_score", "graph_pagerank")

  private def runAll(): Map[String, Seq[org.apache.spark.sql.Row]] =
    keys.map(k => k -> SparkEntry.queries(k)(spark, sf).collect().toSeq)
      .toMap

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally confs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("results are invariant under AQE off") {
    val base = runAll()
    withConfs("spark.sql.adaptive.enabled" -> "false") {
      keys.foreach { k =>
        assert(SparkEntry.queries(k)(spark, sf).collect().toSeq == base(k),
          s"$k result depends on AQE")
      }
    }
  }

  test("results are invariant under broadcast joins disabled") {
    val base = runAll()
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      keys.foreach { k =>
        assert(SparkEntry.queries(k)(spark, sf).collect().toSeq == base(k),
          s"$k result depends on the broadcast join strategy")
      }
    }
  }
}
