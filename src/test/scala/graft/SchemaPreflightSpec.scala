package graft

import org.apache.spark.sql.types._

/** Schema-drift tripwire (VERDICT r9 #3). The driver regenerates the
  * testdata between rounds and has already changed a physical type once
  * (events.ts: INT64 TIMESTAMP(NANOS) → TIMESTAMP(MICROS, NTZ) between
  * r7 and r8), which surfaced as 91 identical cascading stack traces.
  * This spec reads every corpus table once and asserts the dtypes the
  * engine depends on, printing actual-vs-expected per column on mismatch
  * — one look names the drifted column.
  */
class SchemaPreflightSpec extends SparkTestBase {

  private def check(table: String, expected: Map[String, Set[DataType]]): Unit = {
    val actual = Tables.t(spark, sf, table).schema
      .map(f => f.name -> f.dataType).toMap
    val problems = expected.flatMap { case (name, ok) =>
      actual.get(name) match {
        case None => Some(s"$table.$name: MISSING (expected one of $ok)")
        case Some(dt) if !ok.contains(dt) =>
          Some(s"$table.$name: got $dt, expected one of $ok")
        case _ => None
      }
    }
    assert(problems.isEmpty,
      s"\nSCHEMA DRIFT in $table — driver regenerated testdata?\n  " +
        problems.mkString("\n  ") +
        s"\nfull actual schema: ${actual.toSeq.sortBy(_._1).mkString(", ")}")
  }

  test("preflight: all corpus tables have the dtypes the engine assumes") {
    val dec152 = DecimalType(15, 2)
    check("region", Map("r_regionkey" -> Set[DataType](LongType, IntegerType),
      "r_name" -> Set[DataType](StringType)))
    check("nation", Map("n_nationkey" -> Set[DataType](LongType, IntegerType),
      "n_regionkey" -> Set[DataType](LongType, IntegerType),
      "n_name" -> Set[DataType](StringType)))
    check("customer", Map("c_custkey" -> Set[DataType](LongType, IntegerType),
      "c_nationkey" -> Set[DataType](LongType, IntegerType),
      "c_acctbal" -> Set[DataType](DoubleType, dec152),
      "c_mktsegment" -> Set[DataType](StringType)))
    check("supplier", Map("s_suppkey" -> Set[DataType](LongType, IntegerType),
      "s_nationkey" -> Set[DataType](LongType, IntegerType)))
    check("part", Map("p_partkey" -> Set[DataType](LongType, IntegerType),
      "p_retailprice" -> Set[DataType](DoubleType, dec152)))
    check("orders", Map("o_orderkey" -> Set[DataType](LongType, IntegerType),
      "o_custkey" -> Set[DataType](LongType, IntegerType),
      "o_totalprice" -> Set[DataType](DoubleType, dec152),
      "o_orderdate" -> Set[DataType](DateType, TimestampNTZType)))
    check("lineitem", Map("l_orderkey" -> Set[DataType](LongType, IntegerType),
      "l_partkey" -> Set[DataType](LongType, IntegerType),
      "l_suppkey" -> Set[DataType](LongType, IntegerType),
      "l_quantity" -> Set[DataType](DoubleType, dec152, LongType, IntegerType),
      "l_extendedprice" -> Set[DataType](DoubleType, dec152),
      "l_discount" -> Set[DataType](DoubleType, dec152),
      "l_shipdate" -> Set[DataType](DateType, TimestampNTZType),
      "l_returnflag" -> Set[DataType](StringType)))
    // events.ts has shipped as both ns-as-long and µs TIMESTAMP_NTZ;
    // Tables.events dispatches on it — both are legal here.
    check("events", Map("event_id" -> Set[DataType](LongType, IntegerType),
      "user_id" -> Set[DataType](LongType, IntegerType),
      "event_type" -> Set[DataType](StringType),
      "value" -> Set[DataType](DoubleType),
      "ts" -> Set[DataType](LongType, TimestampNTZType, TimestampType)))
    check("documents", Map("doc_id" -> Set[DataType](LongType, IntegerType),
      "text" -> Set[DataType](StringType)))
    check("embeddings", Map("vec_id" -> Set[DataType](LongType, IntegerType),
      "label" -> Set[DataType](LongType, IntegerType),
      "embedding" -> Set[DataType](ArrayType(FloatType, containsNull = true),
        ArrayType(FloatType, containsNull = false),
        ArrayType(DoubleType, containsNull = true),
        ArrayType(DoubleType, containsNull = false))))
  }

  test("preflight: embedding dimensionality matches the seeded geometry") {
    // SRP hyperplanes and IVF centroids are seeded 64-dim vectors
    // (SimilarityOps); a driver-side regeneration at another dim must
    // fail HERE as one named assertion, not as a silent wrong-length
    // dot product inside knn_ann_srp/knn_ivf.
    import org.apache.spark.sql.functions._
    val dims = Tables.t(spark, sf, "embeddings")
      .select(size(col("embedding")).as("d")).distinct().collect()
      .map(_.getInt(0)).toSet
    assert(dims == Set(64),
      s"embedding dims drifted to $dims — regenerate the seeded " +
        "hyperplane/centroid geometry in SimilarityOps to match")
  }

  test("preflight: Tables.events normalizes ts_us to epoch-µs BIGINT") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts_us").dataType == LongType,
      s"ts_us must be BIGINT, got ${ev.schema("ts_us").dataType}")
    // value sanity: corpus epoch is ~2024-01-01 (1704067200000000 µs);
    // a ns-read bug would be 1000× larger, a ms/s bug 1000×+ smaller
    val mn = ev.agg(org.apache.spark.sql.functions.min("ts_us"))
      .head().getLong(0)
    assert(mn > 1500000000000000L && mn < 2500000000000000L,
      s"min(ts_us)=$mn is not in the epoch-µs range — unit drift?")
  }
}
