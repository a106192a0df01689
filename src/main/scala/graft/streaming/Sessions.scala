package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Chunked indexing sessions as a STATEFUL STREAM (reference:
  * `src/Server/Controllers/EntityController.cs:94-161` accumulate,
  * `163-199` finalize, 60-minute expiry at `EntityController.cs:19`;
  * client loop `src/Indexer/Scripts/example_chunked.py:54-80`).
  *
  * The reference keeps per-session entity-name sets in server memory and
  * on `sessionComplete` deletes every existing entity NOT in the
  * accumulated set. Here the accumulation is `flatMapGroupsWithState`
  * keyed by session id — state is the accumulated name set, sharded across
  * executors by the session-key shuffle, checkpointed, and expired by a
  * processing-time timeout instead of a wall-clock sweep. On the completing
  * chunk the full set is emitted downstream, where the batch finalize
  * (anti-join, [[graft.ops.Upsert.sessionFinalize]]) runs unchanged.
  */
object Sessions {

  /** One uploaded chunk row. `complete = true` marks the finalizing call
    * (`?sessionComplete=true` in the reference API).
    */
  case class Chunk(sessionId: String, entityName: String, complete: Boolean)

  /** Emitted once per session on completion: the accumulated entity set. */
  case class SessionSet(sessionId: String, entityNames: Seq[String])

  val SessionExpiry: java.time.Duration = java.time.Duration.ofMinutes(60)

  private[graft] def updateSession(withExpiry: Boolean)(
      sessionId: String,
      chunks: Iterator[Chunk],
      state: GroupState[Set[String]]): Iterator[SessionSet] = {
    if (state.hasTimedOut) { // 60-min expiry: drop the half-built session
      state.remove()
      Iterator.empty
    } else {
      var names = state.getOption.getOrElse(Set.empty[String])
      var done = false
      chunks.foreach { c =>
        if (c.entityName.nonEmpty) names += c.entityName
        if (c.complete) done = true
      }
      if (done) {
        state.remove()
        Iterator.single(SessionSet(sessionId, names.toSeq.sorted))
      } else {
        state.update(names)
        if (withExpiry) state.setTimeoutDuration(SessionExpiry.toMillis)
        Iterator.empty
      }
    }
  }

  /** Accumulate chunk uploads per session; emit the full entity set when
    * the completing chunk arrives; expire silent sessions after 60 min.
    *
    * `withExpiry = true` uses a processing-time timeout. NOTE: Spark
    * implements processing-time timeouts by running no-data micro-batches
    * continuously (every batch's clock advance may fire a timeout), so
    * `processAllAvailable()` never settles under it — deterministic tests
    * drive the op with `withExpiry = false` and pin the timeout branch via
    * `TestGroupState` instead.
    */
  def accumulate(
      spark: SparkSession,
      chunks: Dataset[Chunk],
      withExpiry: Boolean = true): Dataset[SessionSet] = {
    import spark.implicits._
    val conf =
      if (withExpiry) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    chunks
      .groupByKey(_.sessionId)
      .flatMapGroupsWithState(OutputMode.Append(), conf)(updateSession(withExpiry))
  }

  /** One CLOSED gap-session: start/last in epoch ns, event count. */
  case class GapSession(userId: Long, startNs: Long, nEvents: Long, durNs: Long)
  // public for Catalyst encoder codegen (constructor access)
  case class OpenSession(startNs: Long, lastNs: Long, n: Long)

  /** Gap-based event sessionization as a watermarked stream — the
    * streaming twin of the q178 batch rule (a user's session breaks when
    * the inter-event gap exceeds `gapNs`). State per user is ONE open
    * session (start, last, count). A session is emitted when (a) a later
    * event breaks it, or (b) the EVENT-TIME timeout fires — the watermark
    * passed last + gap, so no in-horizon event can extend it (the
    * real-deployment closing mechanism; append mode). Events are sorted
    * in-batch (bounded: one micro-batch's rows per user) and late
    * arrivals INSIDE an open session extend its bounds; arrivals later
    * than the lateness horizon are dropped by the upstream watermark,
    * exactly as documented for every watermarked op here.
    *
    * `events` must be streaming with columns (`tsCol`: timestamp,
    * `userCol`: long). StreamingSpec pins closed sessions == the q178
    * batch window rule on the same data.
    */
  def gapSessions(
      events: org.apache.spark.sql.DataFrame,
      tsCol: String,
      userCol: String,
      gapNs: Long,
      lateness: String): Dataset[GapSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    val prepared = events
      .withWatermark(tsCol, lateness)
      .select(col(userCol).cast("long").as("user_id"),
        (unix_micros(col(tsCol)) * 1000L).as("ts"),
        col(tsCol).as("event_time"))
      .as[(Long, Long, java.sql.Timestamp)]
    def update(user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
        state: GroupState[OpenSession]): Iterator[GapSession] = {
      if (state.hasTimedOut) {
        val o = state.get
        state.remove()
        Iterator.single(GapSession(user, o.startNs, o.n, o.lastNs - o.startNs))
      } else {
        val ts = rows.map(_._2).toArray.sorted
        val closed = scala.collection.mutable.ListBuffer.empty[GapSession]
        var open = state.getOption
        ts.foreach { t =>
          open = open match {
            case Some(o) if t - o.lastNs > gapNs =>
              closed += GapSession(user, o.startNs, o.n, o.lastNs - o.startNs)
              Some(OpenSession(t, t, 1L))
            case Some(o) =>
              Some(OpenSession(math.min(o.startNs, t), math.max(o.lastNs, t), o.n + 1L))
            case None => Some(OpenSession(t, t, 1L))
          }
        }
        open.foreach { o =>
          state.update(o)
          // close once the watermark passes last + gap; the timeout must
          // exceed the CURRENT watermark or Spark rejects it
          val wm = state.getCurrentWatermarkMs()
          state.setTimeoutTimestamp(
            math.max((o.lastNs + gapNs) / 1000000L + 1L, wm + 1L))
        }
        closed.iterator
      }
    }
    prepared.groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
