package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables._

/** SURVEY §2.10 extensibility surface: scalar UDF, typed Aggregator UDAF,
  * generator (UDTF via built-in explode(sequence) — the custom `Generator`
  * Catalyst extension point is documented in SURVEY §7.5, not needed here).
  *
  * Scale/cost notes: the scalar UDF blocks codegen and pushdown — it is
  * deliberately the ONLY black-box function in the library, and the same
  * normalization is expressible with built-in lower/regexp_replace (that
  * codegen'd form is what the oracle mirrors). The Aggregator does exact
  * integer-cents arithmetic (Long buffer) so its result is merge-order
  * independent — safe under any partitioning.
  */
object UdxOps {
  /** Weighted-mean buffer: Σ(price_cents · qty), Σ qty — exact integers. */
  final case class WBuf(var pq: Long, var q: Long)

  /** Weighted mean price (weight = quantity) in integer cents, floor'd.
    * Commutative/associative merge ⇒ deterministic across partitionings. */
  object WeightedMeanCents extends Aggregator[(Double, Double), WBuf, Long] {
    override def zero: WBuf = WBuf(0L, 0L)
    override def reduce(b: WBuf, a: (Double, Double)): WBuf = {
      val cents = math.floor(a._1 * 100 + 0.5).toLong
      val qty = math.floor(a._2 + 0.5).toLong
      b.pq += cents * qty; b.q += qty; b
    }
    override def merge(x: WBuf, y: WBuf): WBuf = {
      x.pq += y.pq; x.q += y.q; x
    }
    override def finish(b: WBuf): Long = if (b.q == 0) 0L else b.pq / b.q
    override def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  val queries: Map[String, QFn] = Map(
    "udf_scalar" -> ((s: SparkSession, d: String) => {
      val norm = udf((text: String) =>
        if (text == null) null
        else text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim)
      t(s, d, "documents")
        .select(col("doc_id"), norm(col("text")).as("norm_text"))
        .withColumn("n", length(col("norm_text")))
        .orderBy("doc_id")
    }),

    "udaf_aggregator" -> ((s: SparkSession, d: String) => {
      val wavgCents = udaf(WeightedMeanCents)
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(wavgCents(col("l_extendedprice"), col("l_quantity")).as("cents"))
        .select(col("l_returnflag"),
          (col("cents").cast(DecimalType16) *
            lit(new java.math.BigDecimal("0.01"))).cast(D18_2).as("wavg"))
        .orderBy("l_returnflag")
    }),

    "udtf_generate" -> ((s: SparkSession, d: String) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          explode(sequence(lit(1), col("l_linenumber"))).as("i"))
        .orderBy("l_orderkey", "l_linenumber", "i")))

  private val DecimalType16 = org.apache.spark.sql.types.DecimalType(16, 0)

  val oracle: Map[String, String] = Map(
    "udf_scalar" ->
      ("SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) " +
        "AS norm_text, CAST(length(trim(regexp_replace(lower(text), " +
        "'[^a-z0-9]+', ' ', 'g'))) AS INTEGER) AS n " +
        "FROM documents ORDER BY doc_id"),
    "udaf_aggregator" ->
      ("WITH c AS (SELECT l_returnflag, " +
        "sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "CAST(floor(l_quantity + 0.5) AS BIGINT)) AS pq, " +
        "sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS q " +
        "FROM lineitem GROUP BY 1) " +
        "SELECT l_returnflag, CAST((pq // q) * 0.01 AS DECIMAL(18,2)) AS wavg " +
        "FROM c ORDER BY l_returnflag"),
    "udtf_generate" ->
      ("SELECT l_orderkey, l_linenumber, " +
        "CAST(unnest(generate_series(1, l_linenumber)) AS INTEGER) AS i " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, i"))
}
