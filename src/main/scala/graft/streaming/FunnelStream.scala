package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel tracking — the stateful per-key ingest form of the
  * batch `seq_funnel` key: per user, advance the view → click →
  * purchase stage machine as events arrive. State is one (t1, t2, t3)
  * triple per user (-1 = stage not reached), so state size is
  * user-count-bounded and keyed — the standard scale-out shape — and
  * each micro-batch emits the user's updated funnel row (update mode).
  *
  * Semantics equivalence with the batch key: the batch funnel is
  * t1 = min ts(view), t2 = min ts(click) > t1, t3 = min ts(purchase) >
  * t2 — a greedy scan in ascending (ts_us, event_id) order computes
  * exactly that (a qualifying click is strictly later than t1, so the
  * sorted scan sees t1 first), and stage/t-values are MONOTONE: once
  * set they never change, so the final update row per user is the
  * batch answer. StreamingSpec proves it by chronological chunk
  * replay.
  */
object FunnelStream {
  final case class Ev(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String)
  final case class FunnelState(t1: Long, t2: Long, t3: Long)
  final case class FunnelRow(user_id: Long, t1: Long, t2: Long, t3: Long,
      stage: Int)

  def funnel(rows: Dataset[Ev]): Dataset[FunnelRow] = {
    val ss = rows.sparkSession
    import ss.implicits._
    rows.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[Ev], state: GroupState[FunnelState]) => {
          var FunnelState(t1, t2, t3) =
            state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          it.toArray.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (e.event_type == "view" && t1 < 0) t1 = e.ts_us
            else if (e.event_type == "click" && t1 >= 0 && t2 < 0 &&
              e.ts_us > t1) t2 = e.ts_us
            else if (e.event_type == "purchase" && t2 >= 0 && t3 < 0 &&
              e.ts_us > t2) t3 = e.ts_us
          }
          state.update(FunnelState(t1, t2, t3))
          val stage = Seq(t1, t2, t3).count(_ >= 0)
          FunnelRow(uid, t1, t2, t3, stage)
        })
  }
}
