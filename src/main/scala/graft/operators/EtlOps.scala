package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._

/** The reference's signature ETL chain, end-to-end (SURVEY §0 [PUBLIC]:
  * graphsense-datafeed ingests raw block / transaction / exchange_rates
  * tables — scan → explode nested tx arrays → equi-join rates and block
  * headers → per-period rollups → idempotent keyed writes; the checkout
  * is empty so no file:line exists). Re-expressed on the corpus: orders
  * are the "block headers", each order's lineitems are nested into the
  * reference's `list<struct>` transaction shape and exploded back, a
  * derived per-month rates dim joins in broadcast, and the rollup is a
  * per-month count + rate-adjusted DECIMAL sum. The write side of the
  * chain is [[graft.sources.KeyedUpsertSink]] (SourceSinkSpec).
  *
  * Scale notes: the nest→explode pair is the real plumbing (one shuffle
  * on the nest groupBy — at 100 TB the raw store already holds the
  * nested shape, so ingestion starts at the explode, which is map-side);
  * the rates dim is tiny → broadcast; the rollup is a 2-phase hash
  * aggregate on ~months×years groups. Money stays in DECIMAL through the
  * rate multiply and the sum (both exact), divided and cast once at the
  * output boundary.
  */
object EtlOps {
  val queries: Map[String, QFn] = Map(
    "etl_reference_shape" -> ((s: SparkSession, d: String) => {
      // 1) nest: the reference's list<struct> transaction column
      val nested = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(
          col("l_linenumber").as("n"),
          dec2(col("l_extendedprice")).as("price")))).as("txs"))
      // 2) block headers with a period key
      val blocks = t(s, d, "orders").select(
        col("o_orderkey").as("l_orderkey"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("ym"))
      // 3) per-period exchange rate: a deterministic pure function of
      // the period key, evaluated in-stream — the r3 form materialized
      // it as blocks.distinct + broadcast join, paying a second orders
      // scan for a dim that is derivable; a genuinely EXTERNAL rates
      // table would broadcast-join exactly like join_multiway's dims
      // 4) explode → join header → derive rate → 5) rollup
      nested.select(col("l_orderkey"), explode(col("txs")).as("tx"))
        .join(blocks, "l_orderkey")
        .withColumn("rate_pct", lit(100) + pmod(col("ym"), lit(7)))
        .groupBy(col("ym"))
        .agg(count(lit(1)).as("txs"),
          (sum(col("tx.price") * col("rate_pct")).cast("double") / lit(100.0))
            .as("value_adj"))
        .orderBy("ym")
    }))

  val oracle: Map[String, String] = Map(
    "etl_reference_shape" ->
      ("WITH b AS (SELECT o_orderkey, year(o_orderdate)*100 + " +
        "month(o_orderdate) AS ym FROM orders), " +
        "r AS (SELECT DISTINCT ym, 100 + ym % 7 AS rate_pct FROM b) " +
        "SELECT ym, count(*) AS txs, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * rate_pct) " +
        "AS DOUBLE) / 100.0 AS value_adj " +
        "FROM lineitem JOIN b ON l_orderkey = o_orderkey " +
        "JOIN r USING (ym) GROUP BY ym ORDER BY ym"))
}
