package graft

/** Physical-plan assertions (SURVEY §4): pushdown reaches the parquet
  * scan, small sides broadcast, the merge hint forces SortMergeJoin,
  * aggregates are 2-phase hash aggregates inside whole-stage codegen.
  * These are the properties that keep the plans scale-safe at 100 TB —
  * asserted, not assumed (VERDICT r1: "make that a test, not a comment").
  */
class PlanSpec extends SparkTestBase {
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("scan_pruned pushes filter + projection into the parquet scan") {
    val p = plan("scan_pruned")
    assert(p.contains("PushedFilters:") && p.contains("l_quantity"),
      s"no pushed filter in:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("l_extendedprice"),
      "projection not pruned — scan reads unneeded columns")
  }

  test("join_inner_equi broadcasts the dimension sides") {
    assert(plan("join_inner_equi").contains("BroadcastHashJoin"))
  }

  test("join_hint_shuffle honors the merge hint (SortMergeJoin)") {
    assert(plan("join_hint_shuffle").contains("SortMergeJoin"))
  }

  test("join_range broadcasts the threshold table (no shuffle of facts)") {
    assert(plan("join_range").contains("BroadcastNestedLoopJoin"))
  }

  test("knn_cosine broadcasts the 1-row query vector (1xN, never NxN)") {
    assert(plan("knn_cosine").contains("BroadcastNestedLoopJoin"))
  }

  test("agg_groupby is a 2-phase hash aggregate under codegen") {
    val df = SparkEntry.queries("agg_groupby")(spark, sf)
    df.collect() // force AQE to finalize the physical plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2,
      s"expected partial+final HashAggregate in:\n$p")
    assert(p.contains("*("), s"no whole-stage-codegen span in:\n$p")
  }

  test("scan_parquet orderBy+limit collapses to TakeOrderedAndProject") {
    assert(plan("scan_parquet").contains("TakeOrderedAndProject"))
  }

  test("dedup_minhash candidate join is broadcast (no candidate shuffle)") {
    val p = plan("dedup_minhash")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast in:\n$p")
  }

  test("text_langid broadcasts the language profile") {
    assert(plan("text_langid").contains("BroadcastHashJoin"))
  }

  test("text_tokenize aggregates partially before the shuffle") {
    val p = plan("text_tokenize")
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2,
      s"no partial aggregation in:\n$p")
  }

  test("win_topk_physical plans partial+final custom execs around one exchange") {
    val p = plan("win_topk_physical")
    assert(p.contains("TopKPerGroupPartial") && p.contains("TopKPerGroupFinal"),
      s"custom strategy did not fire:\n$p")
    val partialIdx = p.indexOf("TopKPerGroupPartial")
    val finalIdx = p.indexOf("TopKPerGroupFinal")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(o_custkey")
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"exchange not between final and partial (final@$finalIdx " +
        s"exchange@$exchangeIdx partial@$partialIdx):\n$p")
  }

  test("win_topk_physical equals the window-function formulation") {
    val viaWindow = SparkEntry.queries("win_topk_group")(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn").collect()
    val viaExec = SparkEntry.queries("win_topk_physical")(spark, sf).collect()
    assert(viaExec.length == viaWindow.length,
      s"${viaExec.length} vs ${viaWindow.length} rows")
    viaWindow.zip(viaExec).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("window_session shuffles once on user_id before both window passes") {
    val p = plan("window_session")
    val exchanges = p.sliding("Exchange".length).count(_ == "Exchange")
    // one hashpartitioning(user_id) + the final range sort — no more
    assert(exchanges <= 3, s"too many exchanges ($exchanges):\n$p")
  }
}
