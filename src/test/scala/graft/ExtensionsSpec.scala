package graft

import org.apache.spark.sql.functions._

/** The SparkSessionExtensions surface: injected SQL function and the
  * declarative→codegen optimizer rewrite. */
class ExtensionsSpec extends SparkTestBase {

  test("dot_f32 SQL function registers and evaluates") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT dot_f32(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), " +
        "CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d").collect()
    assert(r(0).getDouble(0) == 11.0)
  }

  test("DotProductRewrite turns aggregate(zip_with(...)) into DotProductF32") {
    GraftExtensions.installOptimizations(spark)
    val df = graft.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"),
        aggregate(
          zip_with(col("embedding"), col("embedding"),
            (a, b) => a.cast("double") * b.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("dot"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_f32"),
      s"rewrite did not fire; optimized plan:\n$optimized")
    // identical values to the un-rewritten interpreted form (L2-normalized
    // vectors: self-dot ≈ 1)
    val vals = df.orderBy("vec_id").limit(5).collect().map(_.getDouble(1))
    vals.foreach(v => assert(math.abs(v - 1.0) < 1e-3, s"self-dot $v"))
  }

  test("dot_f32 replicates zip_with null/padding semantics exactly") {
    GraftExtensions.install(spark)
    // Each case evaluated both ways: the declarative idiom (which the
    // optimizer may rewrite) must agree with dot_f32 itself — including
    // unequal lengths (zip_with pads with nulls → NULL) and null
    // elements (NULL propagates through the sum).
    val cases = Seq(
      ("CAST(array(1.0, 2.0) AS ARRAY<FLOAT>)",
        "CAST(array(3.0) AS ARRAY<FLOAT>)"),               // unequal length
      ("CAST(array(1.0, NULL) AS ARRAY<FLOAT>)",
        "CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)"),          // null element
      ("CAST(array() AS ARRAY<FLOAT>)",
        "CAST(array() AS ARRAY<FLOAT>)"),                  // both empty → 0.0
      ("CAST(NULL AS ARRAY<FLOAT>)",
        "CAST(array(1.0) AS ARRAY<FLOAT>)"))               // null input
    for ((a, b) <- cases) {
      val declarative = spark.sql(
        s"SELECT aggregate(zip_with($a, $b, (x, y) -> " +
          "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, " +
          "(acc, v) -> acc + v) AS d").collect()(0)
      val custom = spark.sql(s"SELECT dot_f32($a, $b) AS d").collect()(0)
      assert(declarative.isNullAt(0) == custom.isNullAt(0) &&
        (declarative.isNullAt(0) ||
          declarative.getDouble(0) == custom.getDouble(0)),
        s"dot_f32($a, $b): declarative=$declarative custom=$custom")
    }
  }

  test("bloom_filter_agg/might_contain admit every inserted key (no false negatives)") {
    GraftExtensions.install(spark)
    graft.Tables.t(spark, sf, "orders").createOrReplaceTempView("bloom_orders")
    val missed = spark.sql(
      "SELECT count(*) AS c FROM bloom_orders WHERE NOT might_contain(" +
        "(SELECT bloom_filter_agg(xxhash64(o_orderkey)) FROM bloom_orders), " +
        "xxhash64(o_orderkey))").collect()(0).getLong(0)
    assert(missed == 0, s"bloom dropped $missed true keys")
  }

  test("rewrite leaves non-matching aggregates alone") {
    GraftExtensions.installOptimizations(spark)
    val df = graft.Tables.t(spark, sf, "embeddings")
      .select(aggregate(
        zip_with(col("embedding"), col("embedding"),
          (a, b) => a.cast("double") + b.cast("double")), // + not *
        lit(0.0), (acc, x) => acc + x).as("s"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("dot_f32"))
    assert(df.collect().length == 500)
  }
}
