package graft.ops

/** Run independent eager Spark jobs (artifact-build writes) CONCURRENTLY
  * from a bounded thread pool — guide §2.6 "overlap independent jobs":
  * a lifecycle entry's build phase is several independent write actions,
  * and each action's stage tail leaves most cores idle (at local[32] a
  * tiny write job spends most of its wall on scheduling + the last task;
  * on a cluster the same tail idles whole executors). Spark's scheduler
  * runs concurrently-submitted jobs FIFO, so the next build's tasks
  * back-fill the current build's straggler tail — same total work,
  * shorter wall, at any scale.
  *
  * Callers must pass truly independent thunks: no write→read ordering
  * between them, no shared scratch path, and NEVER where a write-order
  * crash contract exists (the maintenance cores' "FIRST (contract)"
  * writes stay sequential). Concurrent thunks that share a cached frame
  * are safe: BlockManager's per-block write lock makes one thread
  * compute a cached partition while the others wait and reuse it.
  *
  * Failure semantics: waits for ALL thunks, then rethrows the FIRST
  * failure in ARGUMENT order (unwrapped from ExecutionException), so a
  * catch site classifying the error (e.g. [[Dedup.budgetRefusal]]'s
  * cause-chain walk) sees the same exception a sequential run of the
  * same list would have surfaced first.
  */
object Par {
  private[graft] def jobs(thunks: (() => Unit)*): Unit = {
    if (thunks.size <= 1) { thunks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futures = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        })
      }
      val outcomes = futures.map(f => scala.util.Try(f.get()))
      outcomes.foreach {
        case scala.util.Failure(e: java.util.concurrent.ExecutionException)
          if e.getCause != null => throw e.getCause
        case scala.util.Failure(e) => throw e
        case _ => ()
      }
    } finally pool.shutdown()
  }
}
