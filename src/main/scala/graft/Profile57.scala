package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev guard: the round-5 text-dedup additions on the adversarial 100k-doc
  * corpus — `graft.Profile57 [sfDir]` (default /tmp/sfbig, regenerable via
  * `graft.GenCorpus`).
  *
  * Watches two distinct blowup modes:
  *   - q57 (repeated-substring spans): the gram groupBy is linear in corpus
  *     grams, but a heavy-duplication corpus multiplies the flagged-gram
  *     join fan-in — the probe proves the span merge stays bounded.
  *   - q59 (blocked Levenshtein): head/tail-16 blocking keys can go hot when
  *     many docs share an opening phrase; the probe counts candidate pairs
  *     surviving the length-band filter vs pairs verified, the ratio that
  *     decides whether the blocking key needs a length-band component.
  *
  * Measured on the GenCorpus 100k-doc corpus (2026-08-12): q57 spans
  * 12.8 s (64,251 spans); q59 candidates 57,308 (≈1e-5 of the 5B possible
  * pairs — the blocking key needs no length-band component at this shape),
  * verified pairs 12,046 in 5.6 s including the verify; q56 tfidf 8.8 s
  * for 300k keyword rows (the vocabulary join at 100k docs).
  */
object Profile57 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s  ($r)")
    }
    time("q56 tfidf rows")(graft.ops.TextOps.q56Tfidf(spark, d).count())
    time("q57 spans")(graft.ops.Dedup.q57SubstrSpans(spark, d).count())
    val docs = Tables.spread(spark, Tables.documents(spark, d), "doc_id")
    time("q59 candidates (post length-band, pre-verify)")(
      graft.ops.Dedup.editCandidates(docs).count())
    time("q59 verified pairs")(graft.ops.Dedup.editPairs(docs).count())
    spark.stop()
  }
}
