package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the containment family's STEADY-STATE economics at scale
  * (round-18, verdict #4) — `graft.ProfileContain [sfDir] [freshMod]`
  * (default /tmp/sfreal1m 100, i.e. a 1% ingest batch). Rows:
  *   - oneshot      the full directed-pair run (q161's shape) — the
  *                  223.7 s-at-1M r17 anchor's successor; linear in
  *                  index tokens, the inverted index's honest cost
  *   - art_build    containment artifact build (rank pairs + seg0) over
  *                  the corpus MINUS the fresh batch — the once-per-
  *                  snapshot cost
  *   - art_append   folding the fresh batch as one segment — O(fresh)
  *   - art_serve    the ingest question from the persisted segments
  *                  (fresh prefixes against the segment union)
  *   - incremental  the self-contained incremental entry on the same
  *                  split (recomputes the corpus side — what the artifact
  *                  path exists to avoid)
  * The steady-state claim is art_append + art_serve ≪ oneshot (the
  * q70/q129 split applied to the containment family). */
object ProfileContain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfreal1m")
    val freshMod = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Dedup
    def timed[T](tag: String)(body: => T): T = {
      // row isolation: drop the previous row's in-query caches first (the
      // Bench convention) so storage pressure never bleeds across rows
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val out = body
      println(f"$tag%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      out
    }
    val docs = Tables.spread(spark, Tables.documents(spark, d), "doc_id")
      .select("doc_id", "text")
    val fresh = docs.filter(col("doc_id") % freshMod === 0)
    val existing = docs.filter(col("doc_id") % freshMod =!= 0)
    val root = s"/tmp/graft_contain_probe/${d.replaceAll("[^A-Za-z0-9._-]", "_")}"
    try {
      timed("oneshot") {
        val n = Dedup.containmentPairs(Dedup.shingleDocs(docs), 0.8).count()
        println(s"  oneshot pairs=$n")
      }
    } catch {
      case e: Throwable if Dedup.budgetRefusal(e).isDefined =>
        println(s"oneshot REFUSED: ${Dedup.budgetRefusal(e).get.take(160)}")
    }
    timed("art_build")(Dedup.containmentArtifactBuild(spark, root, existing))
    timed("art_append")(Dedup.containmentAppend(spark, root, fresh, "seg1"))
    timed("art_serve") {
      val n = Dedup.containmentServeFresh(spark, root, fresh, 0.8).count()
      println(s"  served pairs=$n")
    }
    timed("incremental") {
      val n = Dedup.incrementalContainment(Dedup.shingleDocs(docs),
        fresh.select("doc_id"), 0.8).count()
      println(s"  incremental pairs=$n")
    }
    // round-19 (verdict #3a): serve cost vs SEGMENT COUNT, and what the
    // size-tiered compactor buys back — the same fresh batch re-appended
    // as 10 daily-style segment slices, served, then compacted to one
    // segment and served again (rows byte-identical, so the delta is
    // purely the per-segment listing + union + explode overhead)
    timed("append_10seg") {
      (0 until 10).foreach(i => Dedup.containmentAppend(spark, root,
        fresh.filter(expr(s"(doc_id div $freshMod) % 10") === i), s"seg2_$i"))
    }
    val probe = fresh
    timed("serve_12seg") {
      val n = Dedup.containmentServeFresh(spark, root, probe, 0.8).count()
      println(s"  segs=${Dedup.containmentSegmentCount(spark, root)} pairs=$n")
    }
    timed("compact") {
      val acted = Dedup.maybeCompactContainment(spark, root, maxSegments = 1)
      println(s"  acted=$acted segs=${Dedup.containmentSegmentCount(spark, root)}")
    }
    timed("serve_1seg") {
      val n = Dedup.containmentServeFresh(spark, root, probe, 0.8).count()
      println(s"  segs=${Dedup.containmentSegmentCount(spark, root)} pairs=$n")
    }
    spark.stop()
  }
}
