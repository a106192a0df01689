package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming burst detector — the continuous form of the q223 batch
  * report, with the identical FLOAT-FREE rule: an hour is a burst when
  * its count sits more than 3 trailing-window standard deviations above
  * the trailing 24-hour mean, evaluated as (n·c − S)² > 9·(n·S2 − S²)
  * over integers (n, S, S2 from the CLOSED hours within the 24 before
  * it; n ≥ 12 required). State per event-type key is the trailing ≤ 24
  * closed (hour, count) pairs plus the one open hour — fixed-size, so
  * the monitor's memory is |types|×25 longs at any volume. An hour is
  * evaluated and emitted the moment a later hour's first event arrives
  * (the q229/ScdStream close-on-successor pattern); the final open hour
  * stays in state. Within a micro-batch rows apply in ts order;
  * StreamingSpec pins stream flags == the batch RANGE-window computation
  * on the same events restricted to closed hours.
  */
object BurstStream {

  /** One event on the monitored stream. */
  case class Ev(eventType: String, ts: Long)

  /** Closed-hour verdict. */
  case class Flag(eventType: String, hour: Long, c: Long, burst: Boolean)

  /** Per-type state: trailing closed hours (ascending) + the open hour. */
  case class TypeState(closed: Vector[(Long, Long)], openHour: Long,
      openCount: Long)

  private def evaluate(closed: Vector[(Long, Long)], hour: Long,
      c: Long): Boolean = {
    val win = closed.filter { case (h, _) => h >= hour - 24 && h < hour }
    val nw = win.length.toLong
    if (nw < 12) false
    else {
      val s = win.map(_._2).sum
      val s2 = win.map(x => x._2 * x._2).sum
      val a = nw * c - s
      val varNum = nw * s2 - s * s
      a > 0 && (varNum == 0L || a * a > 9L * varNum)
    }
  }

  private[graft] def update(
      key: String,
      rows: Iterator[Ev],
      state: GroupState[TypeState]): Iterator[Flag] = {
    var st = state.getOption
    val out = Vector.newBuilder[Flag]
    rows.toSeq.sortBy(_.ts).foreach { e =>
      val h = e.ts / 3600000000000L
      st match {
        case Some(t) if t.openHour == h =>
          st = Some(t.copy(openCount = t.openCount + 1))
        case Some(t) if h > t.openHour =>
          out += Flag(key, t.openHour, t.openCount,
            evaluate(t.closed, t.openHour, t.openCount))
          val closed = (t.closed :+ (t.openHour -> t.openCount))
            .dropWhile { case (ch, _) => ch < h - 24 }
          st = Some(TypeState(closed, h, 1L))
        case Some(t) => // late event into an already-closed hour: recount
          // is impossible without reopening; count it into the open hour
          // (the documented at-the-source assumption, as EventDedupStream)
          st = Some(t.copy(openCount = t.openCount + 1))
        case None =>
          st = Some(TypeState(Vector.empty, h, 1L))
      }
    }
    st.foreach(state.update)
    out.result().iterator
  }

  /** Continuous burst flags over a streaming (event_type, ts) frame;
    * `ts` is epoch-ns.
    */
  def detect(events: DataFrame): Dataset[Flag] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_type").as("eventType"), col("ts"))
      .as[Ev]
      .groupByKey(_.eventType)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
