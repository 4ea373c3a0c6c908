package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** SURVEY §2.9 streaming / time-series, batch-first: every windowed op is
  * a batch query with semantics identical to its Structured Streaming
  * form (the replay-equivalence harness in StreamingSpec runs the real
  * readStream/writeStream path over chronological file chunks).
  *
  * The reference's date-bucketed rollups (exchange rates, per-day stats —
  * SURVEY §0 [PUBLIC]) generalize to tumbling/sliding/session windows.
  *
  * Scale notes: tumbling/sliding use Spark's `window()` on a real
  * TimestampType column (groupBy shuffle on (window, key) — 2-phase agg);
  * session windows use gaps-and-islands (one shuffle on user_id; at
  * cluster scale this is the same shuffle `session_window` would do).
  * `stream_late_data`'s running high-watermark over a single global order
  * is the batch replay of the streaming watermark — inherently sequential
  * (matches the single watermark the streaming engine tracks); the window
  * is unpartitioned by design and documented as such.
  */
object TimeOps {
  private val HourUs = 3600L * 1000000L
  private val SlideUs = 900L * 1000000L

  val queries: Map[String, QFn] = Map(
    "window_tumbling" -> ((s: SparkSession, d: String) =>
      events(s, d)
        .withColumn("tstamp", timestamp_micros(col("ts_us")))
        .groupBy(window(col("tstamp"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sumDec(col("value")).as("sum_v"))
        .select(unix_micros(col("w.start")).as("ws_us"), col("event_type"),
          col("cnt"), col("sum_v"))
        .orderBy("ws_us", "event_type")),

    "window_sliding" -> ((s: SparkSession, d: String) =>
      events(s, d)
        .withColumn("tstamp", timestamp_micros(col("ts_us")))
        .groupBy(window(col("tstamp"), "1 hour", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(unix_micros(col("w.start")).as("ws_us"), col("event_type"),
          col("cnt"))
        .orderBy("ws_us", "event_type")),

    "window_session" -> ((s: SparkSession, d: String) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .withColumn("prev", lag("ts_us", 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull ||
            col("ts_us") - col("prev") > 1800L * 1000000L, 1).otherwise(0))
        .withColumn("sid", sum("new_s").over(wRun))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("cnt"), min(col("ts_us")).as("s_start"),
          (max(col("ts_us")) - min(col("ts_us"))).as("dur_us"))
        .orderBy("user_id", "sid")
    }),

    // Batch analog of streaming dropDuplicates-within-watermark: keyed
    // deterministic reduce (min event_id per composite key).
    "stream_dedup" -> ((s: SparkSession, d: String) =>
      events(s, d)
        .groupBy(col("user_id"), col("event_type"), col("ts_us"))
        .agg(min(col("event_id")).as("event_id"), count(lit(1)).as("dup_cnt"))
        .orderBy("user_id", "ts_us", "event_type")),

    // Batch replay of the 10-min watermark: a row is late iff it arrives
    // (event_id order) with ts_us below the running max minus the delay.
    "stream_late_data" -> ((s: SparkSession, d: String) => {
      val w = Window.orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      events(s, d)
        .withColumn("hwm", max("ts_us").over(w))
        .where(col("hwm").isNotNull &&
          col("ts_us") < col("hwm") - 600L * 1000000L)
        .select(col("event_id"), col("user_id"), col("ts_us"), col("hwm"))
        .orderBy("event_id")
    }))

  val oracle: Map[String, String] = Map(
    "window_tumbling" ->
      (s"SELECT (epoch_us(ts) // $HourUs) * $HourUs AS ws_us, event_type, " +
        "count(*) AS cnt, " + oSumDec("value") + " AS sum_v " +
        "FROM events GROUP BY 1, 2 ORDER BY ws_us, event_type"),
    "window_sliding" ->
      (s"SELECT ((epoch_us(ts) // $SlideUs) - k) * $SlideUs AS ws_us, " +
        "event_type, count(*) AS cnt FROM events, " +
        "(SELECT unnest([0, 1, 2, 3]) AS k) off " +
        "GROUP BY 1, 2 ORDER BY ws_us, event_type"),
    "window_session" ->
      ("WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events), " +
        "f AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL OR " +
        "ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)), " +
        "s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id " +
        "ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW) AS sid FROM f) " +
        "SELECT user_id, CAST(sid AS BIGINT) AS sid, count(*) AS cnt, " +
        "min(ts_us) AS s_start, max(ts_us) - min(ts_us) AS dur_us " +
        "FROM s GROUP BY user_id, sid ORDER BY user_id, sid"),
    "stream_dedup" ->
      ("SELECT user_id, event_type, epoch_us(ts) AS ts_us, " +
        "min(event_id) AS event_id, count(*) AS dup_cnt FROM events " +
        "GROUP BY 1, 2, 3 ORDER BY user_id, ts_us, event_type"),
    "stream_late_data" ->
      ("SELECT event_id, user_id, ts_us, hwm FROM " +
        "(SELECT event_id, user_id, epoch_us(ts) AS ts_us, " +
        "max(epoch_us(ts)) OVER (ORDER BY event_id ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm FROM events) " +
        "WHERE hwm IS NOT NULL AND ts_us < hwm - 600000000 ORDER BY event_id"))
}
