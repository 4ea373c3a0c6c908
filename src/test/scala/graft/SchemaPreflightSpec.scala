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

  test("preflight: Tables.events normalizes ts_us to epoch-µs BIGINT") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts_us").dataType ==
      org.apache.spark.sql.types.LongType,
      s"ts_us must be BIGINT, got ${ev.schema("ts_us").dataType}")
  }
}
