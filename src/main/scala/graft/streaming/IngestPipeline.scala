package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sources.Sink

/** The reference system's end-to-end role, Spark-first: a continuously
  * arriving raw feed → watermarked exactly-once dedup → idempotent keyed
  * store (SURVEY §0 [PUBLIC]: graphsense-datafeed ingested blocks/txs/
  * rates into a Cassandra raw keyspace; the checkout is empty, no
  * file:line exists). Here: Structured Streaming file replay →
  * `dropDuplicates` within the watermark → `foreachBatch` into any
  * [[graft.sources.Sink]]. With a Cassandra-connector-backed Sink this
  * IS that service; offline it lands in per-batch parquet directories.
  *
  * Exactly-once across failures — the standard foreachBatch recipe,
  * tested by StreamingSpec's kill/restart case:
  *  1. the checkpoint replays an uncommitted epoch under the SAME
  *     batch id after a crash/stop;
  *  2. each batch lands under `table/batch=<id>` — an overwrite-mode
  *     Sink makes the replay idempotent (a torn first write is simply
  *     rewritten), exactly the Cassandra-upsert discipline;
  *  3. [[graft.sources.KeyedUpsertSink]] adds deterministic per-key
  *     last-writer-wins WITHIN the batch.
  * Upstream dropDuplicates guarantees a key appears in only one epoch
  * (within the watermark), so per-key exactly-once holds end-to-end.
  * Readers see the union via partition discovery (`batch` becomes a
  * partition column).
  *
  * Scale notes: dedup state is keyed by event_id and watermark-bounded;
  * foreachBatch batches are written by the executors that own them
  * (no driver collection).
  */
object IngestPipeline {
  def start(events: DataFrame, sink: Sink, table: String,
      checkpointDir: String, watermark: String = "10 minutes"): StreamingQuery =
    EventStreams.dedup(events, watermark)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink.write(batch.drop("tstamp"), s"$table/batch=$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
