package graft

/** Every declared query runs at sf0.001; keys with guaranteed-nonempty
  * results are asserted rows > 0 (SURVEY §5.2). */
class OperatorSmokeSpec extends SparkTestBase {
  // Keys that may legitimately return 0 rows at sf0.001 (anti-joins,
  // late-data replays, near-dup pairs under a high τ on a tiny corpus).
  private val mayBeEmpty = Set("join_anti", "stream_late_data",
    "sim_jaccard_pairs", "dedup_minhash", "scan_pruned", "join_range",
    "set_except", "knn_ann_srp", "dedup_embed")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      else assert(n >= 0)
    }
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
