package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the continuous form of
  * [[graft.ops.TemporalJoin.asOf]]: annotate each probe event with the
  * most recent reference value at-or-before it on the same key.
  *
  * State per key is a ts-sorted vector of references inside a bounded
  * event-time `horizon` (the watermark analogue): references older than
  * `newest − horizon` are evicted EXCEPT the newest one at-or-below the
  * cut, which is retained as the floor for future probes — dropping it
  * would turn "no recent update" into a spurious null. The per-key state
  * is therefore O(references within horizon), sharded by the group-key
  * shuffle and checkpointed like all flatMapGroupsWithState state.
  *
  * Ordering contract: rows are processed in event-time order WITHIN each
  * micro-batch (references before probes at equal ts, matching the batch
  * operator's tie rule); a probe in batch N+1 can match a reference from
  * any batch ≤ N+1 within the horizon — including out-of-order probes,
  * which the retained history answers correctly. What append-mode
  * streaming cannot do (by construction, same as any streaming engine) is
  * retro-correct a probe already emitted when an even-later-arriving
  * reference with an older timestamp turns up.
  */
object AsOfStream {

  /** Reference-stream row: the value carried onto later probes. */
  case class Tick(key: String, ts: Long, value: Double)

  /** Probe-stream row to be enriched. */
  case class Probe(key: String, ts: Long, id: Long)

  /** One output row per probe; ref fields are None when no reference
    * at-or-before the probe exists within the retained history.
    */
  case class Enriched(id: Long, key: String, ts: Long,
                      refTs: Option[Long], refValue: Option[Double])

  /** Internal union row: the two input streams tagged into one group. */
  case class Event(key: String, ts: Long, isRef: Boolean, id: Long, value: Double)

  private[graft] def update(horizon: Long)(
      key: String,
      rows: Iterator[Event],
      state: GroupState[Vector[(Long, Double)]]): Iterator[Enriched] = {
    var refs = state.getOption.getOrElse(Vector.empty)
    val out = Vector.newBuilder[Enriched]
    // event-time order; references sort before probes at equal ts so an
    // equal-time reference matches (the batch operator's tie rule)
    rows.toSeq.sortBy(e => (e.ts, !e.isRef)).foreach { e =>
      if (e.isRef) {
        // append is the common case; sort covers out-of-order references
        refs = refs :+ (e.ts -> e.value)
        if (refs.length > 1 && refs(refs.length - 2)._1 > e.ts)
          refs = refs.sortBy(_._1)
      } else {
        val floor = refs.reverseIterator.find(_._1 <= e.ts)
        out += Enriched(e.id, key, e.ts, floor.map(_._1), floor.map(_._2))
      }
    }
    if (refs.nonEmpty) {
      val cut = refs.last._1 - horizon
      val floorIdx = refs.lastIndexWhere(_._1 <= cut)
      if (floorIdx > 0) refs = refs.drop(floorIdx) // keep refs(floorIdx) as floor
      state.update(refs)
    }
    out.result().iterator
  }

  /** Enrich `probes` with the latest `ticks` value per key. `horizon` is
    * the event-time span (same unit as `ts`) of reference history kept
    * per key.
    */
  def enrich(spark: SparkSession, ticks: Dataset[Tick], probes: Dataset[Probe],
             horizon: Long): Dataset[Enriched] = {
    import spark.implicits._
    ticks.map(t => Event(t.key, t.ts, isRef = true, id = -1L, value = t.value))
      .unionByName(
        probes.map(p => Event(p.key, p.ts, isRef = false, id = p.id, value = 0.0)))
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update(horizon))
  }
}
