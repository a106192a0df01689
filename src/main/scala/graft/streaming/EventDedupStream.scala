package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ingest-side retry-storm suppression — the continuous form of
  * the q204 batch report: an event is a retry duplicate when the same
  * (user, type, value) key occurred within `windowNs` of the IMMEDIATELY
  * PRECEDING event on that key (the batch side's one `lag` over a
  * key-partitioned window). State per key is a single long (the last seen
  * timestamp) — the cheapest per-key payload there is — but the KEY SET
  * is whatever (user, type, value) cardinality the feed carries: on a
  * high-cardinality-value feed keys track the stream (measured: ≈1 state
  * row per event on the synthetic corpus at K=1/10/100, flat ~326 B/key —
  * SCALE.md §round 15), which is exactly why a production deployment
  * MUST evict idle keys with a processing-time timeout ≫ windowNs (a
  * retry window of seconds never needs last-week's keys). Within a
  * micro-batch, rows are applied in (ts, event_id) order so the flags are
  * deterministic and equal to the batch lag regardless of how the batch
  * splits; across batches the stream assumes per-key arrival in event-time
  * order (the at-the-source placement this operator is for — an
  * out-of-order deployment would put a watermark + sort ahead of it).
  * StreamingSpec pins the streamed flag set == the batch lag computation
  * on the same events; the spec and soak paths keep NoTimeout so
  * equality with batch is exact.
  */
object EventDedupStream {

  /** One event on the dedup key. */
  case class Ev(eventId: Long, ts: Long, userId: Long, eventType: String,
      value: Double)

  /** Per-event verdict: `dup` = suppress as a retry. */
  case class Flagged(eventId: Long, dup: Boolean)

  /** Per-key state: timestamp of the last event applied on this key. */
  case class KeyState(lastTs: Long)

  private[graft] def update(windowNs: Long)(
      key: (Long, String, Double),
      rows: Iterator[Ev],
      state: GroupState[KeyState]): Iterator[Flagged] = {
    var last: Option[Long] = state.getOption.map(_.lastTs)
    val out = rows.toSeq.sortBy(e => (e.ts, e.eventId)).map { e =>
      val dup = last.exists(l => e.ts - l <= windowNs)
      last = Some(e.ts)
      Flagged(e.eventId, dup)
    }
    last.foreach(l => state.update(KeyState(l)))
    out.iterator
  }

  /** Continuous retry flags over a streaming (event_id, ts, user_id,
    * event_type, value) frame; `ts` is epoch-ns — the UNBOUNDED-STATE
    * form: one long per key, but the KEY set tracks the stream on a
    * high-cardinality feed (measured: ≈1 key/event, 9.99M keys / 2.92 GB
    * in-heap at K=100 — SCALE.md §round 15). **Production default is
    * [[detectEvicting]]**, which drops keys idle longer than `idle`
    * (sound whenever idle ≫ the retry window — state becomes
    * keys-active-per-horizon, bounded by arrival rate; soaked: plateaus
    * and drains to 0, SCALE.md §round 15/16). Use THIS form only for
    * bounded replays or exact batch-parity checks (the spec/soak paths),
    * or pair it with the RocksDB state-store provider to keep the key
    * table off-heap.
    */
  def detect(events: DataFrame, windowNs: Long = 60000000000L): Dataset[Flagged] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_id").as("eventId"), col("ts"),
        col("user_id").as("userId"), col("event_type").as("eventType"),
        col("value"))
      .as[Ev]
      // normalize -0.0 → 0.0 in the key: Scala tuple equality separates
      // the two zero bit patterns while the pinned batch twin's SQL
      // partitioning (Window.partitionBy("value")) treats them equal —
      // without this, a -0.0/0.0 retry pair would split across stream
      // keys and escape the dedup (NaN is already fine: Double.equals
      // unifies NaNs, matching SQL's NaN grouping)
      .groupByKey(e => (e.userId, e.eventType,
        if (e.value == 0.0) 0.0 else e.value))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update(windowNs))
  }

  private[graft] def updateEvicting(windowNs: Long, idle: String)(
      key: (Long, String, Double),
      rows: Iterator[Ev],
      state: GroupState[KeyState]): Iterator[Flagged] = {
    if (state.hasTimedOut) {
      // the key sat idle past the eviction horizon: anything arriving
      // later is, by the horizon ≫ windowNs argument, not a retry of
      // what we dropped
      state.remove()
      Iterator.empty
    } else {
      val out = update(windowNs)(key, rows, state)
      state.setTimeoutDuration(idle)
      out
    }
  }

  /** [[detect]] with the STRUCTURAL mitigation applied (the measured
    * reality above: keys track the stream on a high-cardinality feed, so
    * an unevicted key set is corpus-linear — SCALE.md §round 15): keys
    * idle longer than `idle` are dropped via processing-time timeout.
    * Sound whenever `idle` ≫ windowNs converted to wall-clock lag: a
    * retry window of seconds never needs a key that has been silent for
    * minutes, so eviction can only forget pairs that were already
    * outside the window. State becomes keys-active-per-idle-horizon —
    * bounded by arrival rate, not stream length (the detectWindowed
    * argument, per-key instead of per-band). Same deployment note as
    * detectWindowed: run under a PACED trigger; processing-time
    * timeouts busy-loop no-data batches under Trigger(0). Spec-pinned
    * via TestGroupState (non-timed-out parity with [[detect]]'s fold,
    * timeout removal, post-eviction re-arrival flagged fresh).
    */
  def detectEvicting(events: DataFrame, windowNs: Long = 60000000000L,
      idle: String = "10 minutes"): Dataset[Flagged] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_id").as("eventId"), col("ts"),
        col("user_id").as("userId"), col("event_type").as("eventType"),
        col("value"))
      .as[Ev]
      // same -0.0 normalization as detect (the key must match its twin)
      .groupByKey(e => (e.userId, e.eventType,
        if (e.value == 0.0) 0.0 else e.value))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(
        updateEvicting(windowNs, idle))
  }
}
