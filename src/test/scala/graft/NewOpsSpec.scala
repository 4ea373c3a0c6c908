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

  test("agg_moments matches a double-precision reference per group") {
    // independent formulation: collect the raw quantities and compute
    // skewness / excess kurtosis directly in Scala doubles; the
    // shipped integer-power-sum finish must agree to ~1e-9 (identical
    // inputs, algebraically equal expressions)
    val xs = Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val out = SparkEntry.queries("agg_moments")(spark, sf).collect()
    assert(out.length == xs.size)
    out.foreach { r =>
      val v = xs(r.getString(0))
      val n = v.length.toDouble
      val mean = v.sum / n
      val m2 = v.map(x => (x - mean) * (x - mean)).sum / n
      val m3 = v.map(x => math.pow(x - mean, 3)).sum / n
      val m4 = v.map(x => math.pow(x - mean, 4)).sum / n
      assert(r.getLong(1) == v.length)
      assert(math.abs(r.getDouble(6) - m3 / (m2 * math.sqrt(m2))) < 1e-6,
        s"${r.getString(0)}: skew ${r.getDouble(6)}")
      assert(math.abs(r.getDouble(7) - (m4 / (m2 * m2) - 3.0)) < 1e-6,
        s"${r.getString(0)}: kurt ${r.getDouble(7)}")
    }
  }

  test("fn_url: parsed fields recompose the url; domain is eTLD+1-shaped") {
    val out = SparkEntry.queries("fn_url")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val Seq(url, proto, host, path, qref, dom) =
        (1 to 6).map(r.getString)
      assert(url.startsWith(s"$proto://$host$path?"),
        s"$url !~ $proto://$host$path")
      assert(url.contains(s"?ref=$qref&"), s"$url: q_ref $qref")
      assert(host.endsWith(s".$dom") && dom.count(_ == '.') == 1,
        s"host $host domain $dom")
    }
  }

  test("graph_common_neighbors matches brute force at sf0.001") {
    val edges = Tables.t(spark, sf, "lineitem")
      .where(col("l_orderkey") % 5 === 0)
      .select(col("l_suppkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byPart = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val brute = collection.mutable.Map.empty[(Long, Long), Long]
    byPart.values.foreach { supps =>
      val s = supps.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.size)
        brute((s(i), s(j))) = brute.getOrElse((s(i), s(j)), 0L) + 1L
    }
    val expect = brute.toSeq.map { case ((a, b), c) => (c, a, b) }
      .sortBy { case (c, a, b) => (-c, a, b) }.take(50)
      .map { case (c, a, b) => (a, b, c) }
    val got = SparkEntry.queries("graph_common_neighbors")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"top-50 diverges: got ${got.take(3)} " +
      s"expect ${expect.take(3)}")
  }

  test("sample_split_time: splits partition the log, boundaries ordered") {
    val out = SparkEntry.queries("sample_split_time")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val total = Tables.events(spark, sf).count()
    assert(out.values.map(_._1).sum == total,
      s"split rows ${out.values.map(_._1).sum} != corpus $total")
    // temporal ordering with the embargo day strictly between:
    // max(train) < min(embargo) ≤ max(embargo) < min(test), and the
    // embargo day absorbs exactly [t0+21d, t0+22d)
    for (tr <- out.get("train"); te <- out.get("test")) {
      assert(tr._4 < te._3, s"train max ${tr._4} !< test min ${te._3}")
      out.get("embargo").foreach { em =>
        assert(tr._4 < em._3 && em._4 < te._3, "embargo not between")
        assert(te._3 - tr._4 >= 86400L * 1000000L - (em._4 - em._3 + 1),
          "gap narrower than the embargo day")
      }
    }
  }

  test("graph_cc matches union-find brute force at sf0.001") {
    val edges = Tables.t(spark, sf, "lineitem")
      .where(col("l_quantity") === 1 && col("l_orderkey") % 7 === 0)
      .select(col("l_suppkey"), col("l_partkey") + operators.GraphOps.PartOffset)
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(a: Long): Long = {
      var r = a
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = a
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(ru) = rv
    }
    val nodes = edges.flatMap { case (u, v) => Seq(u, v) }.distinct
    // min-label per root — the operator's declared component id
    val minOf = nodes.groupBy(find).map { case (r, ns) => r -> ns.min }
    val expect = nodes.map(n => n -> minOf(find(n))).toMap
    val got = SparkEntry.queries("graph_cc")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, s"CC assignment diverges: " +
      s"${(expect.keySet ++ got.keySet).find(k => expect.get(k) != got.get(k))}")
  }

  test("agg_linreg matches a double-precision OLS reference per group") {
    val rows = Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val got = SparkEntry.queries("agg_linreg")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    rows.groupBy(_._1).foreach { case (flag, xs) =>
      val n = xs.length.toDouble
      val (sx, sy) = (xs.map(_._2).sum, xs.map(_._3).sum)
      val sxy = xs.map(t => t._2 * t._3).sum
      val (sxx, syy) = (xs.map(t => t._2 * t._2).sum, xs.map(t => t._3 * t._3).sum)
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = (sy - slope * sx) / n
      val r2 = math.pow(n * sxy - sx * sy, 2) /
        ((n * sxx - sx * sx) * (n * syy - sy * sy))
      val (gn, gs, gi, gr) = got(flag)
      assert(gn == xs.length, s"$flag: n $gn != ${xs.length}")
      // the reference sums doubles (order-dependent); the operator sums
      // exact decimals — agree to a relative 1e-6
      assert(math.abs(gs - slope) <= 1e-6 * math.max(1.0, math.abs(slope)),
        s"$flag: slope $gs vs $slope")
      assert(math.abs(gi - intercept) <=
        1e-6 * math.max(1.0, math.abs(intercept)),
        s"$flag: intercept $gi vs $intercept")
      assert(gr >= 0.0 && gr <= 1.0 + 1e-9, s"$flag: r2 $gr out of [0,1]")
      assert(math.abs(gr - r2) <= 1e-6, s"$flag: r2 $gr vs $r2")
    }
  }

  test("agg_mad matches a sorted-array reference per group") {
    def q50(v: Array[Double]): Double = {
      val s = v.sorted
      val h = (s.length - 1) * 0.5
      val lo = h.toInt
      if (h == lo) s(lo) else (s(lo) + s(lo + 1)) / 2.0
    }
    val rows = Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        (Tables.dec2(col("l_extendedprice")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = SparkEntry.queries("agg_mad")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    rows.groupBy(_._1).foreach { case (flag, xs) =>
      val cents = xs.map(_._2.toDouble).toArray
      val med = q50(cents)
      val dev = cents.map(c => math.abs(c - med))
      val mad = q50(dev)
      val rz = dev.max / (1.4826 * mad)
      val (gn, gm, gd, gz) = got(flag)
      assert(gn == xs.length, s"$flag: n $gn != ${xs.length}")
      assert(math.abs(gm - med / 100.0) <= 1e-6, s"$flag: median $gm")
      assert(math.abs(gd - mad / 100.0) <= 1e-6, s"$flag: mad $gd")
      assert(math.abs(gz - rz) <= 1e-5 * rz, s"$flag: robust z $gz vs $rz")
    }
  }

  test("agg_ttest matches a double-precision Welch reference per group") {
    val rows = Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val got = SparkEntry.queries("agg_ttest")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    val all = rows.map(_._2)
    rows.groupBy(_._1).foreach { case (flag, xs) =>
      val g = xs.map(_._2)
      val rest = all.length - g.length
      def mv(v: Seq[Double]): (Double, Double) = {
        val m = v.sum / v.length
        (m, v.map(x => (x - m) * (x - m)).sum / (v.length - 1))
      }
      val restVals = {
        // rest = corpus minus this group's values (multiset)
        val cnt = collection.mutable.Map.empty[Double, Int]
        g.foreach(x => cnt(x) = cnt.getOrElse(x, 0) + 1)
        all.filter { x =>
          val c = cnt.getOrElse(x, 0)
          if (c > 0) { cnt(x) = c - 1; false } else true
        }
      }
      val (m1, v1) = mv(g.toIndexedSeq)
      val (m2, v2) = mv(restVals.toIndexedSeq)
      val se2 = v1 / g.length + v2 / rest
      val tRef = (m1 - m2) / math.sqrt(se2)
      val dofRef = se2 * se2 /
        (math.pow(v1 / g.length, 2) / (g.length - 1) +
          math.pow(v2 / rest, 2) / (rest - 1))
      val (gn, gm1, gm2, gt, gdof) = got(flag)
      assert(gn == g.length, s"$flag: n $gn != ${g.length}")
      assert(math.abs(gm1 - m1) <= 1e-5, s"$flag: mean_g $gm1 vs $m1")
      assert(math.abs(gm2 - m2) <= 1e-5, s"$flag: mean_rest $gm2 vs $m2")
      assert(math.abs(gt - tRef) <= 1e-4 * math.max(1.0, math.abs(tRef)),
        s"$flag: t $gt vs $tRef")
      assert(math.abs(gdof - dofRef) <= 1e-4 * dofRef,
        s"$flag: dof $gdof vs $dofRef")
    }
  }

  test("graph_kcore matches iterative-peel brute force; guard raises at 0 rounds") {
    val edges = Tables.t(spark, sf, "lineitem")
      .where(col("l_quantity") <= 2)
      .select(col("l_suppkey"), col("l_partkey") + operators.GraphOps.PartOffset)
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = collection.mutable.Map.empty[Long, collection.mutable.Set[Long]]
    edges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, collection.mutable.Set.empty) += v
      adj.getOrElseUpdate(v, collection.mutable.Set.empty) += u
    }
    var alive = adj.keySet.toSet
    var changed = true
    while (changed) {
      val drop = alive.filter(n => adj(n).count(alive) < 3)
      changed = drop.nonEmpty
      alive --= drop
    }
    val expect = alive.map(n => n -> adj(n).count(alive).toLong).toMap
    val got = SparkEntry.queries("graph_kcore")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, s"k-core diverges: ${(expect.keySet ++ got.keySet)
      .find(k => expect.get(k) != got.get(k))}")
    // under-budget guard: 0 peel rounds leaves sub-core nodes whose
    // recomputed degree is < k, which must RAISE, never silently emit
    val ex = intercept[Exception] {
      operators.GraphOps.kcore(spark, sf, rounds = 0).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("not converged")),
      s"expected the k-core guard, got: $ex")
  }

  test("agg_gini matches a sorted-array reference; bounds hold") {
    val rows = Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        (Tables.dec2(col("l_extendedprice")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = SparkEntry.queries("agg_gini")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    rows.groupBy(_._1).foreach { case (flag, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length.toDouble
      val sx = sorted.map(_.toDouble).sum
      val srx = sorted.zipWithIndex
        .map { case (x, i) => (i + 1) * x.toDouble }.sum
      val gini = (2.0 * srx - (n + 1.0) * sx) / (n * sx)
      val (gn, gg) = got(flag)
      assert(gn == xs.length, s"$flag: n $gn != ${xs.length}")
      assert(gg >= 0.0 && gg < 1.0, s"$flag: gini $gg out of [0,1)")
      assert(math.abs(gg - gini) <= 1e-6, s"$flag: gini $gg vs $gini")
    }
  }

  test("text_feature_hash matches an MD5 reference; counts conserved") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def bucket(w: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 256
    }
    val expect = docs.flatMap { case (id, t) =>
      t.split(" ").map(w => (id, bucket(w)))
    }.groupBy(identity).map { case ((id, b), o) => (id, b, o.length.toLong) }
      .toSet
    val got = SparkEntry.queries("text_feature_hash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, s"feature-hash triplets diverge: " +
      s"${(expect -- got).take(2)} missing, ${(got -- expect).take(2)} extra")
    // per-doc count conservation: Σ cnt = token count
    // toSeq before mapping: a Set of counts would collapse duplicates
    val perDoc = got.groupBy(_._1).view
      .mapValues(_.toSeq.map(_._3).sum).toMap
    docs.foreach { case (id, t) =>
      assert(perDoc(id) == t.split(" ").length.toLong,
        s"doc $id: bucket counts don't sum to token count")
    }
  }

  test("etl_scd2_lookup: each probe matches exactly its effective version") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts_us", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // independent reference: the attribute at ts is the event_type of
    // the LAST change point at or before ts; the version is that
    // change point's ordinal
    val byUser = ev.groupBy(_._1).view.mapValues { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val changes = sorted.zipWithIndex.filter { case (r, i) =>
        i == 0 || sorted(i - 1)._4 != r._4 }.map(_._1)
      changes.zipWithIndex.map { case (r, i) => (r._2, r._3, i + 1, r._4) }
    }.toMap
    val probes = ev.filter(_._3 % 17 == 0)
    val got = SparkEntry.queries("etl_scd2_lookup")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getString(4))).toMap
    assert(got.size == probes.length,
      s"${got.size} matches for ${probes.length} probes — not exactly-one")
    probes.foreach { case (u, ts, eid, _) =>
      // interval semantics: the effective version is the LAST change
      // with eff_from <= ts (equal-ts changes collapse: the earlier
      // version's [t, t) interval is empty, exactly as the operator's
      // pts < eff_to predicate excludes it)
      val c = byUser(u).filter(_._1 <= ts).last
      val (gu, gts, gver, gattr) = got(eid)
      assert(gu == u && gts == ts, s"probe $eid: key/ts mangled")
      assert(gver == c._3 && gattr == c._4,
        s"probe $eid: got v$gver/$gattr expected v${c._3}/${c._4}")
    }
  }

  test("pipe_oversample: balanced classes, full epochs first, stable") {
    val langCnt = Tables.t(spark, sf, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = langCnt.values.max
    val out = SparkEntry.queries("pipe_oversample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byLang = out.groupBy(_._1)
    assert(byLang.keySet == langCnt.keySet, "language set changed")
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == target,
        s"$lang: ${rows.length} rows, want exactly target $target")
      // epoch semantics: copy c is a FULL pass for every c < target/cnt
      // (floor), and copy 0 always covers every doc of the class
      val copies = rows.groupBy(_._3)
      assert(copies(0L).map(_._2).toSet ==
        rows.map(_._2).toSet.take(Int.MaxValue) &&
        copies(0L).length == langCnt(lang),
        s"$lang: copy 0 is not a full pass")
      val fullPasses = target / langCnt(lang)
      (0L until fullPasses).foreach { c =>
        assert(copies(c).length == langCnt(lang),
          s"$lang: copy $c not a full pass")
      }
      assert(copies.keys.max <= fullPasses,
        s"$lang: copy index beyond the truncated final pass")
    }
  }

  test("search_bm25 matches an integer-arithmetic reference top-20") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val tf = docs.map { case (id, t) =>
      id -> t.split(" ").groupBy(identity).map { case (w, a) => w -> a.length.toLong }
    }.toMap
    val dl = tf.map { case (id, m) => id -> m.values.sum }
    val nd = docs.length.toLong
    val sdl = dl.values.sum
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, o) => w -> o.size.toLong }
    val qws = tf(0L).keySet
    val scored = tf.filter(_._1 != 0L).flatMap { case (id, m) =>
      val terms = m.filter(t => qws.contains(t._1))
      if (terms.isEmpty) None else {
        val norm = 250L + (750L * dl(id) * nd) / sdl
        val s = terms.map { case (w, c) =>
          val idf = (1000000L * nd) / df(w)
          (idf * c * 2200L) / (1000L * c + (1200L * norm) / 1000L)
        }.sum
        Some((id, s, terms.size.toLong))
      }
    }.toSeq
    val expect = scored.sortBy { case (id, s, _) => (-s, id) }.take(20)
    val got = SparkEntry.queries("search_bm25")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"bm25 top-20 diverges: got ${got.take(3)} " +
      s"expect ${expect.take(3)}")
  }

  test("pipe_bpe_apply: step-1 merge round-trips pipe_bpe_pairs' " +
    "top-1, and no learned pair survives application (r12)") {
    // Round-trip (VERDICT r11 #7): at step 0 every symbol is one char,
    // so bpeStep's pair argmax (cnt DESC, l, r) and pipe_bpe_pairs'
    // bigram argmax (cnt DESC, bg = l || r) are the SAME ordering —
    // the first learned merge must be exactly the promised next-merge
    // candidate, count included.
    import graft.operators.PipelineOps
    val top = SparkEntry.queries("pipe_bpe_pairs")(spark, sf).head()
    var cur = PipelineOps.bpeSeq0(spark, sf)
    val merges = scala.collection.mutable.Buffer.empty[(String, String)]
    for (_ <- 1 to 4) {
      val (m, next) = PipelineOps.bpeStep(graft.Tables.pin(cur))
      val row = m.head()
      if (merges.isEmpty) {
        assert(row.getString(0) + row.getString(1) == top.getString(0),
          s"first merge ${row.getString(0)}+${row.getString(1)} != " +
            s"pipe_bpe_pairs top-1 ${top.getString(0)}")
        assert(row.getLong(2) == top.getLong(1),
          s"first-merge count ${row.getLong(2)} != ${top.getLong(1)}")
      }
      merges += ((row.getString(0), row.getString(1)))
      cur = next
    }
    // Application completeness: one replace pass per merge is the
    // whole algorithm BECAUSE a merged pair can never reappear later
    // (symbols between two symbols only merge INTO one of them). So
    // after all k merges, none of the learned (l, r) pairs may remain
    // adjacent in ANY final sequence.
    val finalPairs = graft.Tables.pin(cur)
      .select(org.apache.spark.sql.functions.expr(
        "filter(split(seq, '  '), x -> x <> '')").as("syms"))
      .where(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("syms")) >= 2)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.expr(
          "transform(sequence(1, size(syms) - 1), j -> struct(" +
            "element_at(syms, j) AS l, element_at(syms, j + 1) AS r))"))
        .as("p"))
      .select("p.l", "p.r").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    merges.foreach { m =>
      assert(!finalPairs.contains(m),
        s"learned merge $m still adjacent after application")
    }
  }

  test("pipe_bpe_apply matches an independent Scala greedy-BPE " +
    "reference on a run-heavy corpus (r12)") {
    // Independent formulation: learn-and-apply k merges over symbol
    // VECTORS with explicit leftmost-greedy in-word merging — no
    // string encoding, no replace. The corpus is built to hit the
    // overlap edge cases the double-separator encoding must get
    // right: odd/even runs of a repeated symbol ("aaaaa" -> greedy
    // "aa aa a"), merged symbols abutting their own constituents.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bpe_ref").toString
    val texts = Seq(
      "aaaaa aaaa aaa banana bandana",
      "aaaaa abab ababab aab baa",
      "banana banana cabana aaaa")
    val ss = spark
    import ss.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")

    // reference: word table
    val wordCounts = texts.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, o) => (w, o.size.toLong) }
    var seqs: Map[Vector[String], Long] = wordCounts
      .groupBy { case (w, _) => w.map(_.toString).toVector }
      .map { case (v, ws) => (v, ws.values.sum) }
    def mergeWord(v: Vector[String], l: String, r: String)
        : Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < v.length) {
        if (i + 1 < v.length && v(i) == l && v(i + 1) == r) {
          out += (l + r); i += 2 // leftmost-greedy: consume both
        } else { out += v(i); i += 1 }
      }
      out.result()
    }
    for (_ <- 1 to 4) {
      val pc = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      seqs.foreach { case (v, c) =>
        v.indices.dropRight(1).foreach { i =>
          pc((v(i), v(i + 1))) += c
        }
      }
      if (pc.nonEmpty) {
        val (l, r) = pc.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }._1
        seqs = seqs.toSeq
          .map { case (v, c) => (mergeWord(v, l, r), c) }
          .groupBy(_._1).map { case (v, g) => (v, g.map(_._2).sum) }
      }
    }
    val expect = seqs.toSeq
      .flatMap { case (v, c) => v.map(sym => (sym, c)) }
      .groupBy(_._1).map { case (sym, g) => (sym, g.map(_._2).sum) }
      .toSeq.sortBy { case (sym, c) => (-c, sym) }.take(20)

    val got = SparkEntry.queries("pipe_bpe_apply")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect,
      s"bpe_apply diverges from the greedy reference:\n got    $got\n expect $expect")
  }

  test("pipe_bpe_apply: a merge-exhausted step is a no-op, not a " +
    "dataset wipe (r12 self-review)") {
    // Every word is "ab": step 1 merges (a, b) and leaves every
    // sequence single-symbol, so steps 2-4 find NO adjacent pair.
    // The empty argmax frame must no-op (LEFT JOIN ON TRUE), not
    // empty the dataset the way a cross join would — the oracle
    // unrolled the same shape, so the parity gate alone could never
    // catch the wipe.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bpe_exhaust").toString
    val ss = spark
    import ss.implicits._
    Seq((0L, "ab ab ab"), (1L, "ab ab"))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("pipe_bpe_apply")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("ab", 5L)),
      s"exhausted-merge corpus must yield the merged symbol, got $got")
  }
}
