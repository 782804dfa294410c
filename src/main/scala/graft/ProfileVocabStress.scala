package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: the local trainer's collected frame under a HIGH-VOCABULARY
  * corpus — the stress case for q157's "the (word, freq) frame is
  * Zipf-bounded" premise. `GenRealText <dir> <n> <rareWordsPerDoc>` plants
  * globally-unique words per doc (URLs/ids/typos in a real crawl), growing
  * the vocabulary LINEARLY in docs; this measures what that does to the
  * one corpus-sized count job, the driver collect, and the in-memory merge
  * rounds. `graft.ProfileVocabStress [sfDir] [nMerges]`
  * (default /tmp/sfstress 5000). */
object ProfileVocabStress {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfstress")
    val nMerges = if (args.length > 1) args(1).toInt else 5000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val wf = graft.ops.TextOps.bpeWordFreqs(spark, d)
    val tCollect = (System.nanoTime() - t0) / 1e9
    val chars = wf.map(_._1.length.toLong).sum
    println(f"collect      $tCollect%8.2f s  vocab=${wf.length} chars=$chars")
    // a persisted vocab root (arg 3) skips the ~6-min retrain when only
    // the SERVE side is being iterated — training is deterministic, so
    // reuse is exact; pass a fresh dir to force a train
    val vocabBase = if (args.length > 2) args(2)
      else java.nio.file.Files.createTempDirectory("graft_vocab_stress").toString
    val havePublished =
      try { graft.ops.TextOps.resolveVocab(spark, vocabBase)._2.nonEmpty }
      catch { case _: Throwable => false }
    if (!havePublished) {
      val t1 = System.nanoTime()
      val m = graft.ops.TextOps.bpeTrainLocal(wf, nMerges)
      val trainS = (System.nanoTime() - t1) / 1e9
      println(f"train        $trainS%8.2f s  merges=${m.size} " +
        f"per_round=${trainS * 1000 / math.max(1, m.size)}%.2fms")
      graft.ops.TextOps.publishVocab(spark, vocabBase,
        m.map(_._4).distinct.sorted)
    } else println(s"train        (reusing published vocab at $vocabBase)")
    // round-18 (verdict #3): the END-TO-END production-vocab leg — publish
    // the learned table through RootPointer, serve counts via the q145
    // kernel from the RESOLVED artifact, and compare wall + optimized-plan
    // size against the 18,252-entry synthetic vocab on the SAME corpus —
    // the claim "plan size and per-token cost are vocab-size-independent"
    // pinned at production scale instead of extrapolated from 18k.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val (_, vocab) = graft.ops.TextOps.resolveVocab(spark, vocabBase)
    val hist = vocab.groupBy(_.length).view.mapValues(_.size).toSeq.sorted
    println(s"vocab lengths: ${hist.map { case (l, n) => s"$l:$n" }.mkString(" ")}")
    val docs = Tables.spread(spark, Tables.documents(spark, d), "doc_id")
      .select("doc_id", "text")
    def serve(tag: String, v: Seq[String]): Unit = {
      val counts = graft.ops.TextOps.subwordVocabCounts(docs,
        v.toDF("v"), v.map(_.length).distinct.sorted)
      val planChars = counts.queryExecution.optimizedPlan.toString.length
      val t = System.nanoTime()
      val agg = counts.agg(sum("n_words"), sum("n_subwords")).head()
      println(f"$tag%-12s ${(System.nanoTime() - t) / 1e9}%8.2f s  " +
        f"entries=${v.size} plan_chars=$planChars " +
        f"words=${agg.getLong(0)} subwords=${agg.getLong(1)}")
    }
    serve("serve_32k", vocab)
    // the r17 plan-size pin's vocabulary (18,252 entries), same corpus
    serve("serve_18k",
      graft.ops.TextOps.genVocab(spark, 26).collect().map(_.getString(0)).toSeq)
    spark.stop()
  }
}
