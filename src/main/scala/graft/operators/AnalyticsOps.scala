package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Product/event analytics over the event stream — the rollup family the
  * reference's per-day summary statistics generalize to (SURVEY §0
  * [PUBLIC]: per-block/per-day stats rollups), and the standard
  * warehouse workload on any 100 TB event corpus: ordered funnels,
  * cohort retention, and per-bucket OHLC bars.
  *
  * Scale notes (100 TB):
  *  - `seq_funnel`: every stage is a user-keyed shuffle (agg or
  *    equi-join); the per-stage tables are user-count-sized, strictly
  *    shrinking down the funnel. No window over a global order, no
  *    per-user event array materialized — the k-stage funnel is k
  *    keyed joins, each broadcastable once the survivor set is small.
  *  - `agg_retention_cohort`: cohort assignment is one user-keyed agg;
  *    the activity join is user-keyed (co-partitioned with the agg);
  *    the final (cohort, offset) grid is days², tiny. countDistinct
  *    plans as Expand + 2-phase agg — no per-group sets on the heap.
  *  - `agg_ohlc`: one 2-phase hash agg; open/close are
  *    merge-order-independent argmin/argmax via struct extremes over
  *    the unique (ts_us, event_id) order — never first()/last(), which
  *    are partition-order-dependent (SURVEY §7.3.5). min/max/extremes
  *    of doubles are exact selection (no arithmetic), so the output
  *    hash-matches without decimal casts.
  */
object AnalyticsOps {
  private val HourUs = 3600L * 1000000L
  private val DayUs = 86400L * 1000000L

  val queries: Map[String, QFn] = Map(
    // Ordered 3-stage funnel view → click → purchase: per user, t1 =
    // first view, t2 = first click strictly after t1, t3 = first
    // purchase strictly after t2; stage = stages completed (0-3).
    // Strict sequencing (not just presence) is what makes this a
    // funnel, and conditional-min-after-join is its exact relational
    // form — identical SQL on both engines.
    "seq_funnel" -> ((s: SparkSession, d: String) => {
      val e = events(s, d).select(col("user_id"), col("event_type"),
        col("ts_us"))
      val u1 = e.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
      val u2 = e.join(u1, "user_id")
        .where(col("event_type") === "click" && col("ts_us") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t2"))
      val u3 = e.join(u2, "user_id")
        .where(col("event_type") === "purchase" && col("ts_us") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t3"))
      e.select(col("user_id")).distinct()
        .join(u1, Seq("user_id"), "left")
        .join(u2, Seq("user_id"), "left")
        .join(u3, Seq("user_id"), "left")
        .select(col("user_id"), col("t1"), col("t2"), col("t3"),
          (when(col("t1").isNotNull, 1).otherwise(0) +
            when(col("t2").isNotNull, 1).otherwise(0) +
            when(col("t3").isNotNull, 1).otherwise(0)).as("stage"))
        .orderBy("user_id")
    }),

    // First-order transition counts over each user's event sequence —
    // the Markov-chain estimation step behind next-event prediction and
    // session-flow analysis: (from → to) pair frequencies via ONE
    // user-partitioned lead(), then a 2-phase count keyed on the pair.
    // At 100 TB the lead window shuffles once on user_id and the pair
    // agg carries |event_type|² ≤ 25 groups — nothing global anywhere.
    "seq_transition_counts" -> ((s: SparkSession, d: String) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      events(s, d)
        .withColumn("next_type", lead("event_type", 1).over(w))
        .where(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("from_type", "next_type")
    }),

    // Cohort retention: cohort = a user's first active day; for each
    // (cohort day, day offset), distinct users active that day. The
    // exact-integer day arithmetic keys everything.
    "agg_retention_cohort" -> ((s: SparkSession, d: String) => {
      val e = events(s, d)
        .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
      val cohort = e.groupBy(col("user_id")).agg(min(col("day")).as("c0"))
      e.join(cohort, "user_id")
        .groupBy(col("c0"), (col("day") - col("c0")).as("doff"))
        .agg(countDistinct(col("user_id")).as("users"))
        .orderBy("c0", "doff")
    }),

    // Per-(event_type, hour) OHLC bar: open/close = value at the
    // bucket's first/last event in the unique (ts_us, event_id) order,
    // lo/hi = min/max value, plus the count.
    "agg_ohlc" -> ((s: SparkSession, d: String) => {
      val key = struct(col("ts_us"), col("event_id"), col("value"))
      events(s, d).withColumn("bk", expr(s"ts_us div $HourUs"))
        .groupBy(col("event_type"), col("bk"))
        .agg(count(lit(1)).as("cnt"),
          min(key).getField("value").as("open"),
          max(key).getField("value").as("close"),
          min(col("value")).as("lo"), max(col("value")).as("hi"))
        .select(col("event_type"), col("bk"), col("cnt"), col("open"),
          col("hi"), col("lo"), col("close"))
        .orderBy("event_type", "bk")
    }))

  val oracle: Map[String, String] = Map(
    "seq_transition_counts" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(ts) AS ts_us FROM events), " +
        "t AS (SELECT event_type AS from_type, lead(event_type) OVER " +
        "(PARTITION BY user_id ORDER BY ts_us, event_id) AS next_type " +
        "FROM e) " +
        "SELECT from_type, next_type, count(*) AS cnt FROM t " +
        "WHERE next_type IS NOT NULL GROUP BY 1, 2 " +
        "ORDER BY from_type, next_type"),
    "seq_funnel" ->
      ("WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us " +
        "FROM events), " +
        "u1 AS (SELECT user_id, min(ts_us) AS t1 FROM e " +
        "WHERE event_type = 'view' GROUP BY 1), " +
        "u2 AS (SELECT e.user_id, min(ts_us) AS t2 FROM e " +
        "JOIN u1 USING (user_id) " +
        "WHERE event_type = 'click' AND ts_us > t1 GROUP BY 1), " +
        "u3 AS (SELECT e.user_id, min(ts_us) AS t3 FROM e " +
        "JOIN u2 USING (user_id) " +
        "WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY 1), " +
        "u AS (SELECT DISTINCT user_id FROM e) " +
        "SELECT u.user_id, t1, t2, t3, " +
        "CAST(t1 IS NOT NULL AS INTEGER) + CAST(t2 IS NOT NULL AS INTEGER) " +
        "+ CAST(t3 IS NOT NULL AS INTEGER) AS stage " +
        "FROM u LEFT JOIN u1 USING (user_id) LEFT JOIN u2 USING (user_id) " +
        "LEFT JOIN u3 USING (user_id) ORDER BY user_id"),
    "agg_retention_cohort" ->
      (s"WITH e AS (SELECT user_id, epoch_us(ts) // $DayUs AS day " +
        "FROM events), " +
        "c AS (SELECT user_id, min(day) AS c0 FROM e GROUP BY 1) " +
        "SELECT c0, day - c0 AS doff, count(DISTINCT e.user_id) AS users " +
        "FROM e JOIN c USING (user_id) GROUP BY 1, 2 ORDER BY c0, doff"),
    "agg_ohlc" ->
      (s"WITH e AS (SELECT event_type, event_id, value, " +
        s"epoch_us(ts) AS ts_us, epoch_us(ts) // $HourUs AS bk FROM events) " +
        "SELECT event_type, bk, count(*) AS cnt, " +
        "(min(struct_pack(t := ts_us, e := event_id, v := value))).v AS open, " +
        "max(value) AS hi, min(value) AS lo, " +
        "(max(struct_pack(t := ts_us, e := event_id, v := value))).v AS close " +
        "FROM e GROUP BY 1, 2 ORDER BY event_type, bk"))
}
