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
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val wf = graft.ops.TextOps.bpeWordFreqs(spark, d)
    val tCollect = (System.nanoTime() - t0) / 1e9
    val chars = wf.map(_._1.length.toLong).sum
    println(f"collect      $tCollect%8.2f s  vocab=${wf.length} chars=$chars")
    val t1 = System.nanoTime()
    val m = graft.ops.TextOps.bpeTrainLocal(wf, nMerges)
    val trainS = (System.nanoTime() - t1) / 1e9
    println(f"train        $trainS%8.2f s  merges=${m.size} " +
      f"per_round=${trainS * 1000 / math.max(1, m.size)}%.2fms")
    spark.stop()
  }
}
