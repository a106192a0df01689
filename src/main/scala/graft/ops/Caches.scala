package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset

/** Scoped tracking for the pipelines' persisted intermediates (VERDICT r7
  * #6). The dedup/curation dataflows `persist()` md5-heavy intermediates
  * that are read 2–6 times downstream; the cached blocks must outlive the
  * returned (lazy) DataFrame, so the pipelines cannot unpersist them
  * themselves. Previously the only remedy was `spark.catalog.clearCache()`
  * — correct for the batch harness, but a long-lived serving session (the
  * EngineApi story) would nuke its own domain caches along with the
  * pipeline scratch.
  *
  * Every pipeline persist now goes through [[TrackedPersist.persistTracked]],
  * and [[release]] unpersists exactly the tracked scratch — domain-level
  * caches ([[graft.core]]'s `Domain.cache()`) and any user caching are
  * untouched. Call it once the returned DataFrame has been fully consumed
  * (materialized or written); [[graft.api.EngineApi.releaseCaches]] is the
  * serving-facade alias.
  */
object Caches {

  private val tracked = new ConcurrentLinkedQueue[Dataset[_]]()
  private val cleanups = new ConcurrentLinkedQueue[() => Unit]()

  /** Number of tracked, not-yet-released persists (test introspection). */
  def trackedCount: Int = tracked.size() + cleanups.size()

  /** Register an arbitrary cleanup to run at [[release]] — for pinned
    * state that is not a Dataset persist (e.g. the final-round
    * localCheckpoint blocks an iterative algorithm returns, which
    * `spark.catalog.clearCache()` does NOT cover: the catalog only tracks
    * Dataset-level caches, not raw RDD storage levels).
    */
  private[graft] def onRelease(f: () => Unit): Unit = cleanups.add(f)

  /** Drop queue entries whose cache is already gone (a caller that used
    * `spark.catalog.clearCache()` instead of [[release]] — which the
    * pipelines' contract explicitly permits — freed the blocks but left
    * the Dataset references, each retaining its analyzed plan, enqueued
    * here forever). Called on every new registration, so a
    * clearCache-only caller's queue stays bounded by one cycle's
    * persists instead of growing for the life of the JVM.
    */
  private def purgeInert(): Unit =
    tracked.removeIf(d =>
      try d.storageLevel == org.apache.spark.storage.StorageLevel.NONE
      catch { case _: Throwable => true }) // dead session -> drop the ref

  /** Unpersist every tracked pipeline intermediate. Safe to call at any
    * time for plain persisted scratch — a pipeline released before
    * materialization silently recomputes (correct, just slow). The ONE
    * exception: a result backed by an iterative operator's
    * localCheckpoint blocks (connectedComponents — q78 and the curation
    * compositions) has its lineage truncated, so releasing BEFORE the
    * caller's terminal action makes later actions on that frame fail
    * with a missing-checkpoint-block error rather than recompute.
    * Release at cycle boundaries, after results are consumed.
    *
    * Each entry drains under its own guard: one failing unpersist (e.g.
    * scratch registered by a session that has since stopped) must not
    * abort the drain or surface from a hygiene hook.
    */
  def release(): Unit = {
    var d = tracked.poll()
    while (d != null) {
      try d.unpersist(blocking = false)
      catch { case _: Throwable => () }
      d = tracked.poll()
    }
    var c = cleanups.poll()
    while (c != null) {
      try c()
      catch { case _: Throwable => () }
      c = cleanups.poll()
    }
  }

  implicit class TrackedPersist[T](private val ds: Dataset[T]) extends AnyVal {
    /** `persist()` + registration with [[Caches.release]]. */
    def persistTracked(): Dataset[T] = {
      purgeInert()
      val p = ds.persist()
      tracked.add(p)
      p
    }
  }
}
