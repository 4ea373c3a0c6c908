package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property / independent-reference tests for the r10 operator batch
  * (text_entropy, etl_fk_audit, win_ewma, knn_graph,
  * pipe_pack_sequences) — the in-repo layer on top of their DuckDB
  * oracles (SURVEY §5): each key's load-bearing invariant is checked
  * against an independent formulation, not just hash-compared. */
class NewOpsSpec extends SparkTestBase {

  test("text_entropy: bounds, constant-doc zero, uniform-doc log2(n)") {
    val out = SparkEntry.queries("text_entropy")(spark, sf)
      .select("doc_id", "n_tokens", "n_distinct", "entropy").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, d, h) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      // entropy of an n-token distribution with d distinct values lies
      // in [0, log2(d)]; the fixed-point floor loses < 1e-6 per unit
      // count so allow that margin above the bound
      assert(h >= -1e-6, s"doc ${r.getLong(0)}: negative entropy $h")
      assert(h <= math.log(d.toDouble) / math.log(2.0) + 1e-5,
        s"doc ${r.getLong(0)}: entropy $h exceeds log2($d)")
      if (d == 1) assert(math.abs(h) < 1e-6,
        s"doc ${r.getLong(0)}: single-token doc must have entropy 0")
      if (d == n) assert(math.abs(h - math.log(n.toDouble) / math.log(2.0))
        < 1e-4, s"doc ${r.getLong(0)}: all-distinct doc must hit log2(n)")
    }
  }

  test("text_entropy matches a double-precision reference within 1e-4") {
    // independent formulation: plain double H = log2(n) - Σ(c/n)·log2(c)
    // per doc; the shipped fixed-point value must track it to ~1e-4
    // (floor(10⁶·log2 c) truncation is < 1e-6 per count unit)
    val tok = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val ref = tok.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast("double") * log2(col("c"))).as("cl"))
      .select(col("doc_id"), (log2(col("n")) - col("cl") / col("n")).as("href"))
    val joined = SparkEntry.queries("text_entropy")(spark, sf)
      .join(ref, "doc_id")
      .select(abs(col("entropy") - col("href")).as("err"))
      .agg(max(col("err"))).head.getDouble(0)
    assert(joined < 1e-4, s"max |entropy - reference| = $joined")
  }

  test("etl_fk_audit: clean corpus has zero orphans and full key counts") {
    val rows = SparkEntry.queries("etl_fk_audit")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(3) == 0, s"${r.getString(0)}: orphans != 0")
      assert(r.getLong(1) >= r.getLong(2),
        s"${r.getString(0)}: child_rows < ref_keys")
      assert(r.getLong(2) > 0, s"${r.getString(0)}: no referenced keys")
    }
    val li = Tables.t(spark, sf, "lineitem").count()
    assert(rows.filter(_.getString(0).startsWith("lineitem"))
      .forall(_.getLong(1) == li), "lineitem child_rows mismatch")
  }

  test("win_ewma: first event per user equals round6(value)") {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val firsts = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("event_id"), Tables.round6(col("value")).as("v6"))
    val bad = SparkEntry.queries("win_ewma")(spark, sf)
      .join(firsts, "event_id")
      .where(col("ewma") =!= col("v6")).count()
    assert(bad == 0, s"$bad first-events where ewma != round6(value)")
  }

  test("win_ewma matches the explicit 4-term closed form") {
    // independent reference: collect the per-user value sequence and
    // fold the same Horner chain in Scala doubles — bit-identical
    // arithmetic, so equality is exact after round6
    val rows = Tables.events(spark, sf)
      .select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .groupBy(_._1).map { case (k, v) =>
        k -> v.map(_._2).sortBy(t => (t._1, t._2)) }
    val expect = rows.iterator.flatMap { case (_, seq) =>
      seq.zipWithIndex.map { case ((_, eid, _), i) =>
        def v(k: Int) = if (i - k >= 0) seq(i - k)._3 else 0.0
        val h = v(0) + 0.5 * (v(1) + 0.5 * (v(2) + 0.5 * v(3)))
        eid -> math.floor(h * 1e6 + 0.5) / 1e6
      }
    }.toMap
    val got = SparkEntry.queries("win_ewma")(spark, sf)
      .select("event_id", "ewma").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == expect.size)
    val mism = got.count { case (k, v) => v != expect(k) }
    assert(mism == 0, s"$mism events differ from the closed form")
  }

  test("knn_graph equals the brute-force window reference at sf0.001") {
    val emb = Tables.t(spark, sf, "embeddings")
    val a = emb.select(col("vec_id").as("node"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("nbr"), col("embedding").as("eb"))
    val dotExpr = expr(
      "aggregate(zip_with(ea, eb, (x, y) -> double(x) * double(y)), " +
        "0D, (acc, v) -> acc + v)")
    val w = Window.partitionBy("node").orderBy(col("cos").desc, col("nbr"))
    val ref = a.crossJoin(b).where(col("node") =!= col("nbr"))
      .select(col("node"), col("nbr"), Tables.round6(dotExpr).as("cos"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select("node", "nbr", "cos", "rn")
    val out = SparkEntry.queries("knn_graph")(spark, sf)
    assert(out.count() == ref.count())
    assert(out.exceptAll(ref).count() == 0 &&
      ref.exceptAll(out).count() == 0,
      "knn_graph differs from brute-force reference")
  }

  test("pipe_pack_sequences: packs partition the corpus exactly") {
    val packs = SparkEntry.queries("pipe_pack_sequences")(spark, sf)
    val docs = Tables.t(spark, sf, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long")
        .as("n_tok"))
    // token and doc totals are conserved: every doc lands in exactly
    // one pack (start-offset assignment is a function)
    val (pd, pt) = {
      val r = packs.agg(sum("docs"), sum("tokens")).head
      (r.getLong(0), r.getLong(1))
    }
    val (dd, dt) = {
      val r = docs.agg(count(lit(1)), sum("n_tok")).head
      (r.getLong(0), r.getLong(1))
    }
    assert(pd == dd, s"pack docs $pd != corpus docs $dd")
    assert(pt == dt, s"pack tokens $pt != corpus tokens $dt")
    // the emitted pack-id set per source must be EXACTLY the derived
    // set distinct((cum − n_tok) div cap) over the cumulative offsets
    // (ADVICE r10: asserting 0..max contiguity was data-dependent — a
    // doc spanning ≥1 whole capacity window leaves a legitimate gap
    // in pack_id, so the expected set is computed, not assumed dense)
    val cap = 512L
    val byDoc = Tables.t(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = byDoc.map { case (src, rows) =>
      var cum = 0L
      val ids = rows.sortBy(_._2).map { case (_, _, n) =>
        val start = cum; cum += n; start / cap
      }
      src -> ids.toSet
    }
    val got = packs.collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (srcKey, xs) => srcKey -> xs.map(_._2).toSet }
    assert(got == expected,
      s"pack-id sets diverge: ${(expected.keySet ++ got.keySet).find(k =>
        expected.get(k) != got.get(k))}")
    assert(packs.where(col("first_doc") > col("last_doc")).count() == 0)
  }
}
