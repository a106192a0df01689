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
  * Every pipeline persist goes through [[TrackedPersist.persistTracked]].
  * Two release granularities:
  *
  *  - [[scoped]] captures everything one pipeline invocation registers
  *    into a private [[Scope]]; `scope.release()` frees exactly that
  *    invocation's scratch. This is the concurrent-serving form (ADVICE
  *    r8): one request's release cannot unpersist another in-flight
  *    request's scratch or drop its connectedComponents checkpoint blocks.
  *  - [[release]] is the global hammer: it drains the unscoped registry
  *    AND every still-live scope. Correct for the batch harness (Bench /
  *    Verify cycle boundaries, one query at a time); in a concurrent
  *    session it must not run while any other query cycle is in flight —
  *    use scopes there.
  */
object Caches {

  private[ops] final case class Cleanup(run: () => Unit, inert: () => Boolean)

  /** One pipeline invocation's registrations. Obtain via [[scoped]]. */
  final class Scope private[ops] () {
    private[ops] val tracked = new ConcurrentLinkedQueue[Dataset[_]]()
    private[ops] val cleanups = new ConcurrentLinkedQueue[Cleanup]()
    /** Free exactly this scope's persists + cleanups. Idempotent. */
    def release(): Unit = { drain(this); liveScopes.remove(this) }
    /** Registered, not-yet-released entries (test introspection). */
    def size: Int = tracked.size() + cleanups.size()
  }

  private val globalScope = new Scope()
  private val liveScopes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Scope]()
  private val current = new ThreadLocal[Scope]()

  private def scopeFor(): Scope = {
    val s = current.get()
    if (s == null) globalScope else s
  }

  /** Run `body` with every registration it makes (persistTracked,
    * onRelease) captured into a fresh [[Scope]]; returns the result and
    * the scope as a release handle. Registration happens at PLAN BUILD
    * time on the calling thread (persist() and the CC driver loop both run
    * there), so the ThreadLocal capture covers the whole pipeline
    * construction even though the returned frame materializes later.
    * Nesting restores the outer scope on exit.
    */
  def scoped[T](body: => T): (T, Scope) = {
    val s = new Scope()
    liveScopes.add(s)
    val prev = current.get()
    current.set(s)
    try (body, s)
    finally { if (prev == null) current.remove() else current.set(prev) }
  }

  /** Number of tracked, not-yet-released registrations across the global
    * registry and all live scopes (test introspection).
    */
  def trackedCount: Int = {
    var n = globalScope.size
    liveScopes.forEach(s => n += s.size)
    n
  }

  /** Register an arbitrary cleanup to run at release — for pinned state
    * that is not a Dataset persist (e.g. the final-round localCheckpoint
    * blocks an iterative algorithm returns, which
    * `spark.catalog.clearCache()` does NOT cover: the catalog only tracks
    * Dataset-level caches, not raw RDD storage levels). `inert` reports
    * whether the pinned state is already gone (blocks unpersisted by some
    * other path) — [[purgeInert]] uses it to keep a clearCache-only
    * session's queue from growing for the life of the JVM (ADVICE r8).
    */
  private[graft] def onRelease(f: () => Unit,
      inert: () => Boolean = () => false): Unit =
    scopeFor().cleanups.add(Cleanup(f, inert))

  /** Drop queue entries whose cache is already gone (a caller that used
    * `spark.catalog.clearCache()` instead of release — which the
    * pipelines' contract explicitly permits — freed the blocks but left
    * the Dataset references, each retaining its analyzed plan, enqueued
    * forever). Cleanups whose `inert` predicate reports the pinned blocks
    * already unpersisted are run eagerly (freeing any residual) and
    * dropped. Called on every new registration, so a clearCache-only
    * caller's queues stay bounded by one cycle's registrations.
    */
  private def purgeInert(s: Scope): Unit = {
    s.tracked.removeIf(d =>
      try d.storageLevel == org.apache.spark.storage.StorageLevel.NONE
      catch { case _: Throwable => true }) // dead session -> drop the ref
    s.cleanups.removeIf(c =>
      try {
        if (c.inert()) { c.run(); true } else false
      } catch { case _: Throwable => true }) // dead session -> drop
  }

  /** Unpersist every tracked pipeline intermediate — the unscoped registry
    * plus every live scope. Safe to call at any time for plain persisted
    * scratch — a pipeline released before materialization silently
    * recomputes (correct, just slow). The ONE exception: a result backed
    * by an iterative operator's localCheckpoint blocks
    * (connectedComponents — q78 and the curation compositions) has its
    * lineage truncated, so releasing BEFORE the caller's terminal action
    * makes later actions on that frame fail with a missing-checkpoint-
    * block error rather than recompute. Release at cycle boundaries, after
    * results are consumed — and in a CONCURRENT session do not call this
    * while any other cycle is in flight (it drains every scope); release
    * per-invocation [[Scope]] handles instead.
    */
  def release(): Unit = {
    drain(globalScope)
    liveScopes.forEach(drain)
    liveScopes.clear()
  }

  /** Each entry drains under its own guard: one failing unpersist (e.g.
    * scratch registered by a session that has since stopped) must not
    * abort the drain or surface from a hygiene hook.
    */
  private def drain(s: Scope): Unit = {
    var d = s.tracked.poll()
    while (d != null) {
      try d.unpersist(blocking = false)
      catch { case _: Throwable => () }
      d = s.tracked.poll()
    }
    var c = s.cleanups.poll()
    while (c != null) {
      try c.run()
      catch { case _: Throwable => () }
      c = s.cleanups.poll()
    }
  }

  implicit class TrackedPersist[T](private val ds: Dataset[T]) extends AnyVal {
    /** `persist()` + registration with the current scope (the enclosing
      * [[Caches.scoped]] block, or the global registry drained by
      * [[Caches.release]]).
      */
    def persistTracked(): Dataset[T] = {
      val s = scopeFor()
      purgeInert(s)
      val p = ds.persist()
      s.tracked.add(p)
      p
    }
  }
}
