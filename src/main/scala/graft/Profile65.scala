package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev guard: the Bloom membership sketch at ingest scale —
  * `graft.Profile65 [nCorpus] [nProbe] [bits]` (default 10M corpus
  * fingerprints, 10M disjoint probes, 2²⁷ bits = 16 MiB filter ≈ the
  * m/n = 13.4, k = 3 operating point → ~1.1% design FP rate).
  *
  * Validates the three claims q65 makes at 2000× its catalog input:
  *  - the distributed build (partial filters + OR-merge) stays seconds-fast
  *    and its cost is one pass over the hashes;
  *  - probing is map-side filter throughput (no join machinery);
  *  - the measured false-positive rate lands in the design band, and
  *    members are NEVER reported absent.
  */
object Profile65 {
  def main(args: Array[String]): Unit = {
    val nCorpus = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nProbe = if (args.length > 1) args(1).toLong else 10000000L
    val bits = if (args.length > 2) args(2).toInt else (1 << 27)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.BloomAgg.register(spark)

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val corpus = spark.range(0, nCorpus, 1, 32)
    // cached: the probes below reuse the materialized 1-row filter instead
    // of re-running the build per action (steady state persists the filter)
    val bloom = corpus.agg(expr(s"graft_bloom_agg(xxhash64(id), $bits, 3)").as("b")).cache()
    timed(s"build over $nCorpus") { bloom.count() }
    val members = timed(s"probe $nCorpus members") {
      corpus.crossJoin(broadcast(bloom))
        .filter(expr("graft_bloom_contains(b, xxhash64(id))")).count()
    }
    require(members == nCorpus,
      s"false negative: only $members of $nCorpus members probed true")
    val fps = timed(s"probe $nProbe non-members") {
      spark.range(nCorpus, nCorpus + nProbe, 1, 32).crossJoin(broadcast(bloom))
        .filter(expr("graft_bloom_contains(b, xxhash64(id))")).count()
    }
    val rate = fps.toDouble / nProbe
    println(f"false positives: $fps / $nProbe (${rate * 100}%.3f%%)")
    // design point (1-e^(-kn/m))^k with n=10M, m=2^27, k=3 → ~1.1%; allow 2×
    require(rate < 0.025, s"FP rate $rate out of band")
    spark.stop()
  }
}
