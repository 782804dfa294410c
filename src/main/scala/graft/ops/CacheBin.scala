package graft.ops

import org.apache.spark.sql.DataFrame

/** Session-scoped registry of the in-query caches the guarded dedup /
  * phash families create (bucket/fingerprint/rank frames with several
  * lazy consumers — AQE defeats exchange reuse between them, so the
  * cache is load-bearing; see `guardedBandCandidates`). The frames must
  * stay cached until the CALLER's terminal action runs — an in-function
  * unpersist would drop them before the returned lazy frame executes —
  * so the library cannot release them itself.
  *
  * THE CONTRACT for long-lived library sessions: after the action on a
  * guarded entry's result, call [[CacheBin.release]] (or the blunter
  * `spark.catalog.clearCache()`, which is what the Bench/Verify sweeps
  * do per entry). Without it, repeated invocations accumulate executor
  * storage — correct but wasteful (StorageSpec pins that a two-call
  * session with a release in between doesn't double storage).
  */
object CacheBin {
  private val bin = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Register an in-query cache for later [[release]]; returns `df`. */
  private[graft] def note(df: DataFrame): DataFrame = synchronized {
    bin += df; df
  }

  /** Unpersist every registered frame (non-blocking) and empty the bin;
    * returns how many frames were released. Safe to call at any time —
    * a lazy plan re-computes an unpersisted input instead of failing. */
  def release(): Int = synchronized {
    val n = bin.size
    bin.foreach(_.unpersist(blocking = false))
    bin.clear()
    n
  }
}
