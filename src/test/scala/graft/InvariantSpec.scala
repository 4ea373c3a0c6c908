package graft

import org.apache.spark.sql.functions._

/** Semantic invariants (SURVEY §5.3) + accuracy tests for the two ⊘ keys
  * that have no DuckDB oracle (approx sketch, LSH). */
class InvariantSpec extends SparkTestBase {

  test("dedup_cluster_cc reaches the fixpoint within its round budget") {
    // min-propagation (+ pointer jump) is monotone, so round N == round
    // N+1 proves the fixpoint was reached — the declared 6-round result
    // IS the exact CC
    val at6 = operators.TextSimOps.clusterCC(spark, sf, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val at7 = operators.TextSimOps.clusterCC(spark, sf, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(at6 == at7, "label propagation had not converged after 6 rounds")
    // every cluster representative is a member of its own cluster
    val reps = at6.map(_._2).toSet
    assert(reps.subsetOf(at6.map(_._1).toSet))
  }

  test("dedup_cluster_cc convergence guard raises on an exhausted budget") {
    // the shipped key runs checked = true: one guard round compares
    // round N with round N+1 and raise_error()s on any label change, so
    // an unconverged clustering can never be silently emitted. Probed:
    // round 1 != round 2 at this SF, so a 1-round budget must raise…
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString("\n")
    val e = intercept[Exception] {
      operators.TextSimOps.clusterCC(spark, sf, 1, checked = true).collect()
    }
    assert(chain(e).contains("not converged"), chain(e))
    // …and the declared 6-round budget passes the same guard
    assert(SparkEntry.queries("dedup_cluster_cc")(spark, sf).count() > 0)
  }

  test("agg_approx_percentile within 5% of the exact percentile") {
    import graft.Tables.t
    val approx = SparkEntry.queries("agg_approx_percentile")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val exact = t(spark, sf, "lineitem").groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    exact.foreach { case (k, (p50, p90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - p50) / p50 <= 0.05, s"$k p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 <= 0.05, s"$k p90: $a90 vs $p90")
    }
  }

  test("agg_approx_distinct within 5% of exact (rsd=0.05)") {
    import graft.Tables.t
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = t(spark, sf, "lineitem").groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex <= 0.05,
        s"flag $k: approx $ap vs exact $ex off by >5%")
    }
  }

  test("dedup_minhash recall >= 0.9 vs exact Jaccard >= 0.9 ground truth") {
    val exact = SparkEntry.queries("sim_jaccard_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("dedup_minhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exact.nonEmpty) {
      val recall = exact.count(lsh.contains).toDouble / exact.size
      assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} pairs")
    }
  }

  test("knn_cosine top-10 equals the prefix of the full similarity sort") {
    import graft.Tables.{t, round6}
    val emb = t(spark, sf, "embeddings")
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    val full = emb.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), round6(aggregate(
        zip_with(col("embedding"), col("qe"),
          (a, b) => a.cast("double") * b.cast("double")),
        lit(0.0), (acc, x) => acc + x)).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).take(10).toSeq
    val top = SparkEntry.queries("knn_cosine")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top == full)
  }

  test("set_union_all count is additive") {
    import graft.Tables.t
    val a = t(spark, sf, "orders").where(col("o_orderstatus") === "O").count()
    val b = t(spark, sf, "orders").where(col("o_totalprice") > 50000).count()
    assert(SparkEntry.queries("set_union_all")(spark, sf).count() == a + b)
  }

  test("dedup_exact is idempotent (one group per canonical hash)") {
    val out = SparkEntry.queries("dedup_exact")(spark, sf)
    assert(out.select("h").distinct().count() == out.count())
  }

  test("sim_jaccard_pairs is consistent: inter <= uni, threshold holds") {
    SparkEntry.queries("sim_jaccard_pairs")(spark, sf).collect().foreach { r =>
      val (inter, uni) = (r.getInt(2), r.getInt(3))
      assert(inter <= uni && 100 * inter >= 90 * uni)
    }
  }

  test("window_session durations are non-negative, counts sum to |events|") {
    val out = SparkEntry.queries("window_session")(spark, sf)
    assert(out.where(col("dur_us") < 0).count() == 0)
    val total = out.agg(sum("cnt")).collect()(0).getLong(0)
    assert(total == graft.Tables.events(spark, sf).count())
  }
}
