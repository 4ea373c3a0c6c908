package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-dup ingest — the reference's dedup-on-ingest role with
  * MinHash semantics: a document is admitted iff it is the first arrival
  * in every one of its band buckets. The signature/banding is a pure
  * per-row expression ([[graft.operators.TextSimOps.bandRowsOf]] runs
  * unchanged on the stream — no streaming aggregation is needed to build
  * it), so the ONLY stateful operator is this flatMapGroupsWithState
  * keyed by (band, bucket), whose state is one long (the smallest
  * arrival seen). State is therefore bucket-count-bounded and keyed —
  * the standard scale-out shape — and each micro-batch emits its rows
  * immediately (append, no timeout).
  *
  * The batch `stream_neardup` key declares identical semantics
  * (first = min doc_id per bucket); StreamingSpec proves the
  * equivalence by chronological chunk replay.
  */
object NearDupStream {
  final case class BandRow(doc_id: Long, band: Int, bkey: Long)
  final case class BucketHit(doc_id: Long, band: Int, collided: Boolean)

  /** Per (band, bucket): emit one row per arrival, flagging whether an
    * earlier arrival (smaller doc_id, in this or any prior batch) was
    * already seen. Within a batch, rows are processed in doc_id order
    * so intra-batch collisions resolve exactly like arrival order. */
  def bucketHits(rows: Dataset[BandRow]): Dataset[BucketHit] = {
    val ss = rows.sparkSession
    import ss.implicits._
    rows.groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), it: Iterator[BandRow], state: GroupState[Long]) => {
          val sorted = it.toArray.sortBy(_.doc_id)
          var seen = state.getOption.getOrElse(Long.MaxValue)
          val out = sorted.map { r =>
            val collided = seen != Long.MaxValue
            if (r.doc_id < seen) seen = r.doc_id
            BucketHit(r.doc_id, r.band, collided)
          }
          state.update(seen)
          out.iterator
        })
  }
}
