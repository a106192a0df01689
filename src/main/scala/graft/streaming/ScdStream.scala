package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2 interval builder — the continuous form of the q229
  * batch dimension build: per user, consecutive runs of the same event
  * type become validity intervals, and an interval is EMITTED the moment
  * its successor run opens (valid_to = the new run's first timestamp —
  * exactly the batch side's `lead(valid_from)`). State per key is one
  * open run (status, valid_from, n_events) — O(|active keys|), constant
  * per event. The open run is never emitted (the batch report counts
  * open rows separately; a stream consumer reads them from the state
  * store or closes them at shutdown). Within a micro-batch rows apply in
  * (ts, event_id) order so batch splits cannot change the intervals;
  * StreamingSpec pins stream-closed == batch-closed across micro-batch
  * boundaries, including a run left open across batches.
  */
object ScdStream {

  /** One event on the dimension key. */
  case class Ev(userId: Long, ts: Long, eventId: Long, eventType: String)

  /** A CLOSED validity interval (open runs stay in state). */
  case class Interval(userId: Long, status: String, validFrom: Long,
      validTo: Long, nEvents: Long)

  /** Per-user state: the currently open run. */
  case class RunState(status: String, validFrom: Long, nEvents: Long)

  private[graft] def update(
      key: Long,
      rows: Iterator[Ev],
      state: GroupState[RunState]): Iterator[Interval] = {
    var st = state.getOption
    val out = Vector.newBuilder[Interval]
    rows.toSeq.sortBy(e => (e.ts, e.eventId)).foreach { e =>
      st match {
        case Some(r) if r.status == e.eventType =>
          st = Some(r.copy(nEvents = r.nEvents + 1))
        case Some(r) =>
          out += Interval(key, r.status, r.validFrom, e.ts, r.nEvents)
          st = Some(RunState(e.eventType, e.ts, 1L))
        case None =>
          st = Some(RunState(e.eventType, e.ts, 1L))
      }
    }
    st.foreach(state.update)
    out.result().iterator
  }

  /** Continuous closed-interval stream over (user_id, ts, event_id,
    * event_type) rows; `ts` is epoch-ns.
    */
  def intervals(events: DataFrame): Dataset[Interval] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").as("userId"), col("ts"),
        col("event_id").as("eventId"), col("event_type").as("eventType"))
      .as[Ev]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
