package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming point-in-time feature computation — the continuous form of
  * the q272 batch audit's as-of side: per user a running click counter,
  * and every label (purchase) row emits the counter value STRICTLY
  * BEFORE its event time. Same-ts clicks are excluded by the ordering
  * rule — labels apply before clicks at equal event time, exactly the
  * batch twin's (ts, side) window order — so a label can never see a
  * same-instant click.
  *
  * This is the leakage-safe feature-store shape: a training join that
  * reads THIS stream's emissions is point-in-time correct by
  * construction, whereas joining the final counters reproduces exactly
  * the naive-join contamination q272 measures (917‰ of label rows at
  * sf0.01). State per key is ONE long — O(|active users|) total,
  * independent of event volume ([[EventDedupStream]]'s cheapest-state
  * shape). Within a micro-batch rows apply in (ts, side, id) order so
  * emissions are deterministic however the batch splits; across batches
  * the stream assumes per-key event-time arrival (the at-the-source
  * placement contract; an out-of-order deployment puts a watermark +
  * sort ahead).
  *
  * StreamingSpec pins stream emissions == the q272 batch window
  * computation, including a counter carried across the batch boundary
  * and a same-ts (label, click) tie.
  */
object PitCountStream {

  /** One input row: a feature event (click) or a label row (purchase). */
  case class Ev(userId: Long, ts: Long, isLabel: Boolean, id: Long)

  /** Emitted per label row: the as-of feature value at label time. */
  case class Feat(id: Long, userId: Long, ts: Long, pitCount: Long)

  /** Per-key state: clicks applied so far. */
  case class Cnt(n: Long)

  private[graft] def update(
      key: Long,
      rows: Iterator[Ev],
      state: GroupState[Cnt]): Iterator[Feat] = {
    var n = state.getOption.map(_.n).getOrElse(0L)
    val out = Vector.newBuilder[Feat]
    // labels before clicks at equal ts (side 0 < side 1), id-tiebroken
    rows.toSeq.sortBy(e => (e.ts, if (e.isLabel) 0 else 1, e.id)).foreach { e =>
      if (e.isLabel) out += Feat(e.id, key, e.ts, n)
      else n += 1
    }
    state.update(Cnt(n))
    out.result().iterator
  }

  /** Continuous point-in-time click counts over a streaming
    * (user_id, ts, is_label, id) frame; `ts` is epoch-ns. Emits one row
    * per label with the strictly-before click count.
    */
  def features(events: DataFrame): Dataset[Feat] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").as("userId"), col("ts"),
        col("is_label").as("isLabel"), col("id"))
      .as[Ev]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
