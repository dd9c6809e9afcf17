package graft

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Session-scoped, compute-once memo — the shared machinery behind the
  * derived-frame caches (`Dedup.pairsCached`, `Dedup.winsCached`,
  * `Dedup.embeddingPairsCached`, `Similarity.bruteKnnCached`,
  * `Similarity.kmeansCached`, `Similarity.assignCellsCached`): one
  * materialization per (SparkSession, canonicalized input plan,
  * params), shared by every query that consumes the same derivation —
  * the "materialize the expensive intermediate once" production move,
  * expressed as a library seam instead of an orchestration layer.
  *
  * Semantics and limits (deliberate, documented):
  *
  *   - '''Session-scoped.''' Entries live under the owning
  *     [[SparkSession]]; a hit can never return a frame bound to a
  *     different (or stopped) session. Maps belonging to a stopped
  *     session are purged eagerly on the next access of ANY memo, so a
  *     stop/rebuild cycle (the ScalaTest pattern) cannot serve frames
  *     whose SparkContext is dead, and the purge is deterministic
  *     rather than GC-dependent.
  *   - '''Compute-once under races.''' Concurrent first calls insert a
  *     cell via `putIfAbsent` and force the WINNER's lazy value; the
  *     loser's thunk is never evaluated, so a race cannot materialize
  *     (and leak) a second checkpoint of the same derivation.
  *   - '''No data-change detection.''' Keys canonicalize the ANALYZED
  *     PLAN, the same `sameResult` discipline Spark's own CacheManager
  *     uses — and with the same caveat: rewriting the FILES behind the
  *     same path yields a canonicalized-equal plan, so a stale result
  *     would be served. A caller that rewrites inputs in-place must
  *     call [[Memo.invalidate]] (this library's analogue of
  *     `CacheManager.refreshByPath`) — none of the driver-gated
  *     queries do (the testdata dirs are immutable inputs).
  *
  * [[Memo.missCount]] counts materializations JVM-wide so the bench
  * can mark which timing paid a derivation and which hit the memo
  * (memoized queries are run-order dependent by design; the marker
  * keeps their numbers interpretable across rounds).
  */
final class Memo[K, V] private[graft] () {

  private val perSession =
    new java.util.HashMap[SparkSession, TrieMap[K, Memo.Cell[V]]]()

  private def mapFor(session: SparkSession): TrieMap[K, Memo.Cell[V]] =
    perSession.synchronized {
      val it = perSession.entrySet().iterator()
      while (it.hasNext) if (it.next().getKey.sparkContext.isStopped) it.remove()
      var m = perSession.get(session)
      if (m == null) { m = TrieMap.empty[K, Memo.Cell[V]]; perSession.put(session, m) }
      m
    }

  /** The memoized value for `key` in `session`'s scope, computing (and
    * counting) it exactly once per (session, key).
    *
    * Failure semantics: if `compute` throws (e.g. a transient Spark job
    * failure), the cell is REMOVED from the map and the exception
    * propagates — the next caller installs a fresh cell and retries
    * cleanly, and only SUCCESSFUL materializations count as misses (a
    * poisoned cell would otherwise re-run the thunk on every access
    * while inflating the counter). Compute thunks may force OTHER memos
    * (the seams form an acyclic dependency chain, e.g. sigsCached →
    * setsCached) but must never force cells that transitively force
    * this one — cyclic forcing would deadlock on the cells' lazy-val
    * monitors.
    */
  def getOrElseUpdate(session: SparkSession, key: K)(compute: => V): V = {
    val m = mapFor(session)
    val cell = new Memo.Cell[V](() => { val v = compute; Memo.misses.incrementAndGet(); v })
    val winner = m.putIfAbsent(key, cell).getOrElse(cell)
    try winner.value
    catch {
      case t: Throwable =>
        m.remove(key, winner)
        throw t
    }
  }

  /** Drop every entry scoped to `session`. */
  def clear(session: SparkSession): Unit =
    perSession.synchronized { perSession.remove(session); () }

  /** Drop every entry in every session. */
  def clearAll(): Unit = perSession.synchronized { perSession.clear() }
}

object Memo {

  /** Lazy cell: forcing `value` is idempotent and thread-safe (Scala
    * lazy-val semantics), so `putIfAbsent` + force-the-winner gives
    * compute-once without holding any lock across the Spark jobs the
    * thunk runs.
    */
  private[graft] final class Cell[V](thunk: () => V) { lazy val value: V = thunk() }

  private val registry = TrieMap.empty[Memo[_, _], Unit]
  private val misses = new AtomicLong(0L)

  /** Total materializations (memo misses) in this JVM — the bench
    * diffs this around each query to mark memo-paying timings.
    */
  def missCount: Long = misses.get()

  def apply[K, V](): Memo[K, V] = {
    val m = new Memo[K, V]()
    registry.put(m, ())
    m
  }

  /** Invalidate every registered memo for `session` — call after
    * rewriting files behind a path the session has already derived
    * from (the CacheManager.refreshByPath analogue).
    */
  def invalidate(session: SparkSession): Unit =
    registry.keysIterator.foreach(_.clear(session))

  /** Invalidate everything, every session. */
  def invalidateAll(): Unit = registry.keysIterator.foreach(_.clearAll())
}
