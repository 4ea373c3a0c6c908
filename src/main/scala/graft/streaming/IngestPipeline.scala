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
  * IS that service; offline it lands in append-mode parquet.
  *
  * Scale notes: dedup state is keyed by event_id and watermark-bounded;
  * foreachBatch batches are written by the executors that own them
  * (no driver collection); checkpointing gives exactly-once per batch id
  * against an idempotent sink.
  */
object IngestPipeline {
  def start(events: DataFrame, sink: Sink, table: String,
      checkpointDir: String, watermark: String = "10 minutes"): StreamingQuery =
    EventStreams.dedup(events, watermark)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.write(batch.drop("tstamp"), table)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
