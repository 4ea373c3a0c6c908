package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table registry + determinism helpers (SURVEY §1.3, §7.3).
  *
  * All testdata tables are fixed-schema single parquet files. The one
  * interop trap: `events.ts` is INT64 TIMESTAMP(NANOS,false), which vanilla
  * Spark 4.1.2 refuses to read ([PARQUET_TYPE_ILLEGAL]); we set the legacy
  * nanosAsLong flag before every read (idempotent, runtime-settable) and
  * normalize to an epoch-microsecond BIGINT `ts_us` via floor division,
  * matching DuckDB 1.0's ns→µs truncation on the oracle side.
  *
  * Scale note (100 TB design): loaders return plain DataFrames so Catalyst
  * retains full pushdown/pruning freedom; nothing is cached or collected
  * here. On a real cluster the same registry would point at partitioned
  * (date-bucketed) parquet roots and the same code would partition-prune.
  */
object Tables {
  /** Driver-fixed query signature (SparkEntry contract). */
  type QFn = (SparkSession, String) => DataFrame

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events with `ts_us`: epoch-µs BIGINT, floor(ns/1000). */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events").withColumn("ts_us", expr("ts div 1000"))

  val AllTables: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Registers every corpus table as a temp view (events with `ts_us`
    * pre-normalized) so the whole surface is reachable via spark.sql. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    AllTables.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else t(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }

  val D18_2: DecimalType = DecimalType(18, 2)

  /** Money column → DECIMAL(18,2) (SURVEY §7.3.2: double sums are
    * partition-order nondeterministic; decimal sums are exact). */
  def dec2(c: Column): Column = c.cast(D18_2)

  /** Deterministic money sum: accumulate in DECIMAL(18,2) (exact,
    * partition-order independent), emit DOUBLE. The final cast is the
    * correctly-rounded IEEE conversion of one exact decimal value, so
    * Spark and DuckDB produce bit-identical float64 — whereas emitting
    * DECIMAL itself is hash-unsafe downstream: a comparer that floats one
    * side sees "253942.00" vs "253942.0" on trailing-zero values. */
  def sumDec(c: Column): Column = sum(dec2(c)).cast("double")

  /** Money min/max/single-value at the output boundary: exact decimal
    * compare, DOUBLE out (same rationale as [[sumDec]]). */
  def moneyOut(c: Column): Column = dec2(c).cast("double")

  /** Float-derived metrics: fixed evaluation order upstream + a pure-IEEE
    * round-to-6-decimals that both engines compute bit-identically:
    * floor(x*1e6 + 0.5)/1e6. (Spark's round() on doubles goes through the
    * shortest decimal string repr — HALF_UP on that string — while DuckDB
    * rounds numerically; they can disagree on ....x5 shortest-reprs. The
    * floor formulation is mult/add/floor/div, all correctly-rounded IEEE
    * ops, so it is engine-independent.) */
  def round6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)

  /** Oracle-side sum helper, mirrored text of [[sumDec]]. */
  def oSumDec(sqlExpr: String): String =
    s"CAST(sum(CAST($sqlExpr AS DECIMAL(18,2))) AS DOUBLE)"

  /** Oracle-side mirror of [[moneyOut]]. */
  def oMoneyOut(sqlExpr: String): String =
    s"CAST(CAST($sqlExpr AS DECIMAL(18,2)) AS DOUBLE)"

  /** Oracle-side mirror of [[round6]]. */
  def oRound6(sqlExpr: String): String =
    s"floor(($sqlExpr) * 1000000 + 0.5) / 1000000"
}
