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
}
