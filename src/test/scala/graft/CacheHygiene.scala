package graft

import org.scalatest.{BeforeAndAfterEach, Suite}

/** Per-test cache hygiene for the shared-session suites — the SAME
  * session contract Bench/Verify honor per entry (`CacheBin`'s scaladoc:
  * release or `clearCache()` after the action on a guarded entry's
  * result). Without it every spec's in-query caches (guarded dedup rank
  * frames, PageRank round frames, residual trio caches, …) accumulate in
  * the one test JVM for the whole suite: ~10k jobs in, executor storage
  * plus lingering checkpoint blocks crowd the 8 GiB heap, and the r19
  * driver run died exactly there (a FileFormatWriter abort inside a late
  * spec took the shared SparkContext down and failed every spec after
  * it). Releasing after EACH test keeps peak memory flat at
  * one-test-size; correctness is untouched — specs build what they read,
  * and an unpersisted lazy frame recomputes instead of failing. */
trait CacheHygiene extends BeforeAndAfterEach { self: Suite =>
  override protected def afterEach(): Unit = {
    try {
      TestSpark.spark.catalog.clearCache()
      graft.ops.CacheBin.release()
    } finally super.afterEach()
  }
}
