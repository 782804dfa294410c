package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev guard: the curation rules on the REALISTIC corpus — the round-16
  * gap (c)/(d) anchors. `graft.ProfileRealText [sfDir]` (default
  * /tmp/sfreal; run again at /tmp/sfreal1m). Times:
  *   - q20_stats        text-quality stats over the corpus (map-side
  *                      regex/array work — should scale linearly)
  *   - q21_langid       language-ID over the corpus (same shape)
  *   - funnel           q154's six-stage curation funnel (incl. the round-18 excerpt stage), printing the
  *                      per-stage rows — every stage must be NON-VACUOUS
  *                      here (GenCorpus had no stopwords, so stage 1
  *                      dropped 100% there and no funnel anchor existed)
  *   - card             q155's per-source corpus card
  *   - oov_audit        q156's per-source OOV ppm audit
  *   - bpe_train_local  q157: one corpus word-count pass + driver-local
  *                      training at 1,000 merges (per-round ms printed —
  *                      the job-class vs ms-class claim, measured on a
  *                      corpus whose vocabulary is realistic)
  *   - q53_clusters     THE 1M one-shot All-Pairs cluster build through
  *                      the now-default budget guard — open since r15:
  *                      on a realistic vocabulary the prefix filter has
  *                      selectivity, so the one-shot run must COMPLETE
  *                      (the GenCorpus 1M run refuses at 3.43B mass)
  */
object ProfileRealText {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfreal")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    import graft.ops.{Corpus, Dedup, TextOps}
    def time(l: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      val extra = r match { case n: Long => s" rows=$n"; case s: String => s" $s"; case _ => "" }
      println(f"$l%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s$extra")
      spark.sharedState.cacheManager.clearCache()
    }
    time("q20_stats") { TextOps.q20TextStats(spark, d).count() }
    time("q21_langid") { TextOps.q21LangId(spark, d).count() }
    time("funnel") {
      Corpus.q154CurationFunnel(spark, d).collect()
        .map(r => s"${r.getString(1)}:${r.getLong(2)}->${r.getLong(4)}")
        .mkString(" ")
    }
    time("card") { Corpus.q155DatasetCard(spark, d).count() }
    time("oov_audit") { TextOps.q156OovAudit(spark, d).count() }
    time("bpe_train_local") {
      val wf = TextOps.bpeWordFreqs(spark, d)
      val t1 = System.nanoTime()
      val m = TextOps.bpeTrainLocal(wf, 1000)
      val trainMs = (System.nanoTime() - t1) / 1e6
      f"vocab=${wf.length} merges=${m.size} train=${trainMs}%.0fms " +
        f"per_round=${trainMs / math.max(1, m.size)}%.2fms"
    }
    time("q53_clusters") { Dedup.q53DedupClusters(spark, d).count() }
    spark.stop()
  }
}
