package graft

import java.util.concurrent.{Callable, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** The session-scoped memo seam ([[Memo]]) behind pairsCached /
  * winsCached / bruteKnnCached / kmeansCached / assignCellsCached:
  * compute-once under racing first calls, per-key isolation, and the
  * invalidation hook for same-path data rewrites.
  */
class MemoSpec extends SparkSpec {

  test("concurrent first calls compute exactly once (no leaked loser materialization)") {
    val memo = Memo[String, java.lang.Long]()
    val computes = new AtomicLong(0L)
    val pool = Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 16).map { _ =>
        pool.submit(new Callable[java.lang.Long] {
          def call(): java.lang.Long =
            memo.getOrElseUpdate(spark, "k") {
              Thread.sleep(25) // widen the race window
              java.lang.Long.valueOf(computes.incrementAndGet())
            }
        })
      }
      val values = futures.map(_.get(30, TimeUnit.SECONDS)).toSet
      assert(computes.get() === 1L, "racing first calls must materialize once")
      assert(values === Set(java.lang.Long.valueOf(1L)), "every caller sees the winner's value")
    } finally pool.shutdownNow()
  }

  test("keys isolate; invalidate(session) drops entries so a data rewrite can be picked up") {
    val memo = Memo[String, java.lang.Long]()
    val computes = new AtomicLong(0L)
    def get(key: String): Long =
      memo.getOrElseUpdate(spark, key)(java.lang.Long.valueOf(computes.incrementAndGet())).longValue()
    assert(get("a") === 1L)
    assert(get("a") === 1L, "second call is a hit")
    assert(get("b") === 2L, "distinct key computes separately")
    Memo.invalidate(spark)
    assert(get("a") === 3L, "invalidate must force recomputation")
  }

  test("missCount counts materializations, not hits") {
    val memo = Memo[String, java.lang.Long]()
    val before = Memo.missCount
    memo.getOrElseUpdate(spark, "x")(java.lang.Long.valueOf(7L))
    memo.getOrElseUpdate(spark, "x")(java.lang.Long.valueOf(8L))
    assert(Memo.missCount - before === 1L)
  }
}
