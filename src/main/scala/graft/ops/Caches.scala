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

  /** Unpersist every tracked pipeline intermediate. Safe to call at any
    * time — but results of pipelines whose caches are released before
    * materialization silently recompute (correct, just slow).
    */
  def release(): Unit = {
    var d = tracked.poll()
    while (d != null) {
      d.unpersist(blocking = false)
      d = tracked.poll()
    }
    var c = cleanups.poll()
    while (c != null) {
      c()
      c = cleanups.poll()
    }
  }

  implicit class TrackedPersist[T](private val ds: Dataset[T]) extends AnyVal {
    /** `persist()` + registration with [[Caches.release]]. */
    def persistTracked(): Dataset[T] = {
      val p = ds.persist()
      tracked.add(p)
      p
    }
  }
}
