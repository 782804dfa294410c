package graft

import org.apache.spark.sql.SparkSession

/** Dev guard: the subword-counter scaling claims — `graft.ProfileSubword
  * [sfDir]` (default /tmp/sfbig, the 100k adversarial corpus; also run at
  * /tmp/sfbig1m for the 10× growth row). Three rows:
  *   - q137 (30-entry literal vocab, O(|vocab|) per char) — the baseline
  *     the q145 anchor is pinned within 2× of;
  *   - q145 at 1,188 generated entries (broadcast-join vocab, O(1)/char);
  *   - q145 at 18,252 entries — the per-token-cost-independent-of-vocab
  *     claim: this row must sit in the 1,188-entry row's band, because
  *     the only thing that grew is the broadcast table.
  */
object ProfileSubword {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(l: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      val extra = r match { case n: Long => s" rows=$n"; case _ => "" }
      println(f"$l%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s$extra")
      spark.sharedState.cacheManager.clearCache()
    }
    val docs = Tables.spread(spark, Tables.documents(spark, d), "doc_id")
      .select("doc_id", "text")
    time("q137_literal30") {
      graft.ops.TextOps.q137SubwordTokens(spark, d).count()
    }
    time("q145_vocab1188") {
      graft.ops.TextOps.subwordVocabCounts(docs,
        graft.ops.TextOps.genVocab(spark, 8)).count()
    }
    time("q145_vocab18252") {
      graft.ops.TextOps.subwordVocabCounts(docs,
        graft.ops.TextOps.genVocab(spark, 26)).count()
    }
    spark.stop()
  }
}
