package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{CacheBin, Dedup}

/** The library cache-lifecycle contract (CacheBin): the guarded dedup /
  * phash families cache their bucket/fingerprint/rank frames in-query
  * (load-bearing — AQE defeats exchange reuse between the gate's
  * consumers), and the caches must outlive the caller's action, so the
  * library can't release them itself. A long-lived session releases via
  * [[CacheBin.release]] — this spec pins that a two-call session with a
  * release in between does NOT double executor storage, and that the
  * release is safe (results identical before/after). */
class StorageSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("two guarded-entry calls with CacheBin.release between them don't double storage") {
    spark.catalog.clearCache()
    CacheBin.release()
    val sc = spark.sparkContext
    // BASELINE-RELATIVE, not absolute-empty: earlier suites in the shared
    // session leave eval-sized localCheckpoint RDDs registered (e.g. the
    // MMR recursion's final selection leaf — its blocks ARE the returned
    // data, released by the ContextCleaner after GC, not by clearCache),
    // so the assertion pins that THIS entry's caches come and go, keyed
    // by RDD id against the pre-call snapshot
    val baseline = sc.getPersistentRDDs.keySet

    val r1 = Dedup.q25DedupMinhash(spark, sf).count()
    val afterFirst = sc.getPersistentRDDs.keySet -- baseline
    assert(afterFirst.nonEmpty, "vacuous: the guarded entry created no tracked cache")

    val released = CacheBin.release()
    assert(released > 0, "the guarded entry's caches were not tracked in CacheBin")
    val leftover = sc.getPersistentRDDs.keySet -- baseline
    assert(leftover.isEmpty,
      s"release left ${leftover.size} of this entry's persistent RDDs registered")

    val r2 = Dedup.q25DedupMinhash(spark, sf).count()
    val afterSecond = sc.getPersistentRDDs.keySet -- baseline
    assert(afterSecond.size <= afterFirst.size,
      s"storage grew across calls despite the release: ${afterFirst.size} -> ${afterSecond.size}")
    assert(r1 === r2, "release changed results — it must only affect storage")
    CacheBin.release()
  }

  test("budgetRefusal matches only the gate's sentinel, not look-alike prose") {
    // a caller-supplied lever (or unrelated failure) containing the old
    // match phrase must NOT classify as a budget refusal
    val impostor = new RuntimeException(
      "query failed: estimated cost exceeds the budget for this tenant")
    assert(Dedup.budgetRefusal(impostor).isEmpty,
      "an unrelated exception was misclassified as a budget refusal")
    // the real gate raise (sentinel included) classifies, cause-chain deep
    val real = new RuntimeException("outer",
      new RuntimeException(s"${Dedup.BudgetSentinel} All-Pairs candidate " +
        "mass 999 exceeds the budget 10: lever"))
    assert(Dedup.budgetRefusal(real).isDefined)
  }
}
