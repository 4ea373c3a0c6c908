package graft

/** Testdata-drift tripwire (VERDICT r9 #3, r10 #4). The driver
  * regenerates the testdata between rounds and has already changed a
  * physical type once (events.ts: INT64 TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS, NTZ) between r7 and r8), which surfaced as 91
  * identical cascading stack traces. The checks themselves live in
  * [[Preflight]] (shared with `Verify.main`, which prints one
  * actionable line per drift before any key runs); this spec asserts
  * a clean corpus at EVERY on-disk scale factor — dtypes, exact
  * FIXTURES.md row counts, and the value domains the operators
  * hard-code (enum columns, n_chars == length(text), epoch-µs range,
  * 64-dim L2-normalized embeddings). */
class SchemaPreflightSpec extends SparkTestBase {

  for (sfName <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    val dir = s"/root/testdata/$sfName"
    test(s"preflight: $sfName schema, row counts, and value domains " +
      "match FIXTURES.md") {
      assume(new java.io.File(dir).isDirectory, s"$dir not present")
      val problems = Preflight.problems(spark, dir)
      assert(problems.isEmpty,
        s"\nTESTDATA DRIFT at $sfName — driver regenerated testdata?\n  " +
          problems.mkString("\n  "))
    }
  }

  test("preflight: a drifted corpus is reported as named one-liners") {
    // the detection path itself (Verify's canary) — a corpus with a
    // wrong n_chars, an out-of-enum lang, and a denormalized embedding
    // must surface each as its own named problem, not a stack trace
    import org.apache.spark.sql.functions._
    val dir = "target/fixtures/preflight_drift"
    val docs = Tables.t(spark, sf, "documents")
      .withColumn("n_chars",
        when(col("doc_id") === 3, col("n_chars") + 7)
          .otherwise(col("n_chars")))
      .withColumn("lang",
        when(col("doc_id") === 5, lit("xx")).otherwise(col("lang")))
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables.t(spark, sf, "events").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.t(spark, sf, "embeddings")
      .withColumn("embedding",
        when(col("vec_id") === 2,
          expr("transform(embedding, x -> CAST(x * 2 AS FLOAT))"))
          .otherwise(col("embedding")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val problems = Preflight.domainProblems(spark, dir)
    assert(problems.exists(_.contains("documents.n_chars")), problems)
    assert(problems.exists(_.contains("documents.lang")), problems)
    assert(problems.exists(_.contains("not L2-normalized")), problems)
    assert(problems.size == 3, s"expected exactly 3 problems: $problems")
    // and a clean corpus reports nothing (already covered per-SF above,
    // restated here as the negative control for this same code path)
    assert(Preflight.domainProblems(spark, sf).isEmpty)
  }

  test("preflight: Tables.events normalizes ts_us to epoch-µs BIGINT") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts_us").dataType ==
      org.apache.spark.sql.types.LongType,
      s"ts_us must be BIGINT, got ${ev.schema("ts_us").dataType}")
  }
}
