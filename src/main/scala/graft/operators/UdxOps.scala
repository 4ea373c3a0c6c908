package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables._

/** SURVEY §2.10 extensibility surface: scalar UDF, typed Aggregator UDAF,
  * generator (UDTF) in both forms — built-in explode(sequence)
  * (`udtf_generate`) and a custom Catalyst `Generator`
  * ([[graft.functions.ShingleGenerator]], `udtf_shingle_gen`), completing
  * the extension ladder.
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

  /** Bounded top-k per group (k=3, order: price desc then okey asc) as a
    * typed Aggregator: the buffer never exceeds k entries, so the partial
    * (map-side) aggregation ships at most k rows per group per partition —
    * the scalable formulation of "top-3 orders per customer". The window
    * `row_number <= 3` form (win_topk_group) sorts EVERY row of a
    * partition; this one is O(n log k) with a k-bounded shuffle. Same
    * result, same oracle SQL.
    */
  object Top3Orders
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private val K = 3
    private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2) // price desc, okey asc
    private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
      xs.sortWith(lt).take(K)
    override def zero: Seq[(Double, Long)] = Seq.empty
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      trim(b :+ a)
    override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(x ++ y)
    override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  val queries: Map[String, QFn] = Map(
    "agg_topk_heap" -> ((s: SparkSession, d: String) => {
      val topk = udaf(Top3Orders)
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "s")))
        .select(col("o_custkey"), col("s._2").as("o_orderkey"),
          col("s._1").as("o_totalprice"),
          (col("pos") + 1).cast("int").as("rn"))
        .orderBy("o_custkey", "rn")
    }),

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
            lit(new java.math.BigDecimal("0.01"))).cast(D18_2)
            .cast("double").as("wavg"))
        .orderBy("l_returnflag")
    }),

    "udtf_generate" -> ((s: SparkSession, d: String) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          explode(sequence(lit(1), col("l_linenumber"))).as("i"))
        .orderBy("l_orderkey", "l_linenumber", "i")),

    // OUTER generate semantics: explode_outer preserves the parent row
    // (NULL element) when the array is empty — the LEFT-join member of
    // the generator family, and the one ingestion needs so a document
    // with no extractable items is not silently dropped. Array is empty
    // for every third key by construction.
    "udtf_explode_outer" -> ((s: SparkSession, d: String) =>
      t(s, d, "part")
        .withColumn("xs", expr(
          "CASE WHEN p_partkey % 3 = 0 THEN CAST(array() AS array<int>) " +
            "ELSE sequence(1, CAST(p_partkey % 3 AS INT)) END"))
        .select(col("p_partkey"), explode_outer(col("xs")).as("x"))
        .orderBy(col("p_partkey"), asc_nulls_first("x"))),

    // custom Generator end-to-end: the analyzer's ExtractGenerator plans
    // it into Spark's own Generate node, exactly like explode — then the
    // usual 2-phase agg tops the shingle counts
    "udtf_shingle_gen" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.GraftBridge
      val sh = GraftBridge.column(graft.functions.ShingleGenerator(
        GraftBridge.expression(col("text")), 5))
      t(s, d, "documents")
        .select(sh.as("shingle"))
        .groupBy(col("shingle")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("shingle")).limit(30)
    }))

  private val DecimalType16 = org.apache.spark.sql.types.DecimalType(16, 0)

  val oracle: Map[String, String] = Map(
    // same semantics (and oracle) as win_topk_group — different plan:
    // k-bounded partial aggregation instead of a per-partition full sort
    "agg_topk_heap" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, rn FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) " +
        "WHERE rn <= 3 ORDER BY o_custkey, rn"),
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
        "SELECT l_returnflag, CAST(CAST((pq // q) * 0.01 AS DECIMAL(18,2)) AS DOUBLE) AS wavg " +
        "FROM c ORDER BY l_returnflag"),
    "udtf_explode_outer" ->
      ("WITH p AS (SELECT p_partkey, CASE WHEN p_partkey % 3 = 0 " +
        "THEN CAST([] AS BIGINT[]) " +
        "ELSE range(1, CAST(p_partkey % 3 AS INTEGER) + 1) END AS xs " +
        "FROM part) " +
        "SELECT p_partkey, CAST(x AS INTEGER) AS x FROM p " +
        "LEFT JOIN LATERAL (SELECT unnest(xs) AS x) u ON TRUE " +
        "ORDER BY p_partkey, x NULLS FIRST"),
    "udtf_generate" ->
      ("SELECT l_orderkey, l_linenumber, " +
        "CAST(unnest(generate_series(1, l_linenumber)) AS INTEGER) AS i " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, i"),
    "udtf_shingle_gen" ->
      ("SELECT shingle, count(*) AS cnt FROM (" +
        "SELECT unnest(list_transform(range(1, length(text) - 3), " +
        "i -> substr(text, i, 5))) AS shingle " +
        "FROM documents WHERE length(text) >= 5) " +
        "GROUP BY shingle ORDER BY cnt DESC, shingle LIMIT 30"))
}
