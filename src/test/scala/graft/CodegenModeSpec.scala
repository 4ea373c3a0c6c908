package graft

/** Codegen/interpreted dual-path equivalence (r10): every custom
  * Expression ships BOTH an `eval` (interpreted) and a `doGenCode`
  * path, and the default session only ever exercises the generated
  * code — a divergence between the two would go unseen until some
  * production plan falls back to interpretation (codegen over the
  * 64-field limit, nested-in-non-codegen operators, OOM fallback).
  * This spec re-runs the expression-heavy keys with
  * `spark.sql.codegen.factoryMode=NO_CODEGEN` + whole-stage off and
  * requires byte-identical results. */
class CodegenModeSpec extends SparkTestBase {
  // DotProductF32 (dedup_embed, knn_cosine), ShingleHash64
  // (text_fingerprint), SortedIntersectCount + SortedShingleHashes
  // (sim_ngram_jaccard), ShingleGenerator (udtf_shingle_gen),
  // WordGramGenerator (text_lm_score), TokenMinHash (dedup_minhash)
  private val keys = Seq("dedup_embed", "knn_cosine", "text_fingerprint",
    "sim_ngram_jaccard", "udtf_shingle_gen", "text_lm_score",
    "dedup_minhash")

  test("interpreted eval equals generated code on expression-heavy keys") {
    val viaCodegen = keys
      .map(k => k -> SparkEntry.queries(k)(spark, sf).collect().toSeq)
      .toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try keys.foreach { k =>
      val interp = SparkEntry.queries(k)(spark, sf).collect().toSeq
      assert(interp == viaCodegen(k),
        s"$k: interpreted eval diverges from generated code")
      assert(interp.nonEmpty || k == "dedup_embed",
        s"$k returned no rows — vacuous comparison")
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
