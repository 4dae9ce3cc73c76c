package graft.operators

import graft.SparkTestBase
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** The r12 advisor finding: getOrLoad used to run the `load` thunk while
  * holding the cache-wide monitor, so one slow parquet-footer read blocked
  * pure cache HITS of other paths (streaming foreachBatch latency spikes).
  * The rework holds the monitor only for map mutations and serializes
  * same-path loads through a per-path latch — these tests pin that
  * contract. */
class IndexFrameCacheSpec extends SparkTestBase {

  private def df(n: Int) = spark.range(n).toDF("id")

  test("hit, stale-fingerprint reload, and same-path single-flight") {
    val cache = new IndexFrameCache(maxEntries = 4)
    val loads = new AtomicInteger(0)
    def load() = { loads.incrementAndGet(); df(3) }
    val a1 = cache.getOrLoad(spark, "/p/a", "fp1")(load())
    val a2 = cache.getOrLoad(spark, "/p/a", "fp1")(load())
    assert((a1 eq a2) && loads.get() == 1, "second lookup must be a hit")
    cache.getOrLoad(spark, "/p/a", "fp2")(load())
    assert(loads.get() == 2, "changed fingerprint must reload")

    // same-path concurrency: N threads racing the SAME cold path must run
    // the load thunk exactly once (the latch de-duplicates)
    val cold = new IndexFrameCache(maxEntries = 4)
    val coldLoads = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        start.await()
        cold.getOrLoad(spark, "/p/race", "fp") {
          coldLoads.incrementAndGet(); Thread.sleep(100); df(1)
        }
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join(10000))
    assert(coldLoads.get() == 1, s"racing loads of one path ran ${coldLoads.get()} thunks")
  }

  test("a slow load of one path does not block a hit on another path") {
    val cache = new IndexFrameCache(maxEntries = 4)
    cache.getOrLoad(spark, "/p/hot", "fp")(df(2)) // warm the hit path
    val loadStarted = new CountDownLatch(1)
    val releaseLoad = new CountDownLatch(1)
    val slow = new Thread(() => {
      cache.getOrLoad(spark, "/p/slow", "fp") {
        loadStarted.countDown()
        // block until the main thread has proven its hit went through
        releaseLoad.await(10, TimeUnit.SECONDS)
        df(1)
      }
      ()
    })
    slow.start()
    assert(loadStarted.await(10, TimeUnit.SECONDS), "slow load never started")
    // with the load running, a hit on a DIFFERENT path must return promptly
    val t0 = System.nanoTime()
    val hit = cache.getOrLoad(spark, "/p/hot", "fp")(fail("hit path must not reload"))
    val hitMs = (System.nanoTime() - t0) / 1e6
    assert(hit.count() == 2)
    assert(hitMs < 2000, f"hit blocked behind a foreign load ($hitMs%.0f ms)")
    releaseLoad.countDown()
    slow.join(10000)
    assert(cache.size == 2)
  }
}
