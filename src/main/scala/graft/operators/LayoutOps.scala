package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Data-layout operators — the write-time clustering primitives a 100 TB
  * table needs so READ-time scans can skip data (SURVEY §2.11).
  *
  * Z-ORDER (Morton) interleaving maps two scan dimensions onto one sort
  * key by interleaving their bits: sorting/range-partitioning by the
  * z-value bounds every contiguous run of rows in BOTH dimensions at
  * once (a run of 2^(2k) consecutive z-values spans ≤ 2^k values of
  * each dimension), so per-file and per-row-group min/max stats stay
  * narrow on every interleaved dimension — the property parquet
  * stats-based skipping (and any min/max-zone-map store) turns into
  * pruned I/O. A single-column sort gives perfect stats on that column
  * and USELESS (full-range) stats on every other; z-order trades a
  * little of the first for usable stats on all of them. This is the
  * layout behind Delta/Iceberg OPTIMIZE ZORDER, computed here as a pure
  * integer Catalyst expression (codegen'd shifts/masks — no UDF, no
  * helper table).
  *
  * The oracled key exposes the z-value computation itself (exact
  * integer arithmetic, identical term-by-term in DuckDB); the layout
  * EFFECT — per-file extents narrow in both dimensions under a z-order
  * write, full-range in the unsorted dimension under a linear sort —
  * is asserted over real parquet files in LayoutSpec, since file
  * boundaries are not SQL-visible.
  */
object LayoutOps {
  /** Bits taken from each dimension (z-value uses 2·Bits bits). */
  private val Bits = 8
  private val HourUs = 3600L * 1000000L

  /** Morton-interleave the low [[Bits]] bits of two non-negative integer
    * columns: bit i of `a` lands at z-bit 2i, bit i of `b` at 2i+1.
    * Disjoint target bits, so SUM == OR — addition keeps the oracle
    * mirror a plain arithmetic expression in any dialect. */
  private[graft] def zval(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  private def oZval(a: String, b: String): String =
    (0 until Bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** The two layout dimensions of the events table: user bucket and
    * hour-of-epoch bucket, [[Bits]]-bit each. Both non-negative, so
    * Spark's pmod and the oracle's % agree. */
  private[graft] def dims(e: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    e.withColumn("ub", pmod(col("user_id"), lit(1L << Bits)))
      .withColumn("tb", pmod(expr(s"ts_us div $HourUs"), lit(1L << Bits)))

  val queries: Map[String, QFn] = Map(
    // The z-value assignment every row gets at write time (map-side,
    // codegen'd integer expression — the cluster key `repartitionByRange
    // (zval).sortWithinPartitions(zval)` then writes by; LayoutSpec
    // proves the resulting files are extent-bounded in BOTH dims).
    "layout_zorder" -> ((s: SparkSession, d: String) =>
      dims(events(s, d))
        .select(col("event_id"), col("ub").cast("int").as("ub"),
          col("tb").cast("int").as("tb"),
          zval(col("ub"), col("tb")).cast("int").as("zv"))
        .orderBy("zv", "event_id")))

  val oracle: Map[String, String] = Map(
    "layout_zorder" ->
      (s"WITH e AS (SELECT event_id, user_id % ${1L << Bits} AS ub, " +
        s"(epoch_us(ts) // $HourUs) % ${1L << Bits} AS tb FROM events) " +
        "SELECT event_id, CAST(ub AS INTEGER) AS ub, " +
        "CAST(tb AS INTEGER) AS tb, " +
        s"CAST(${oZval("ub", "tb")} AS INTEGER) AS zv " +
        "FROM e ORDER BY zv, event_id"))
}
