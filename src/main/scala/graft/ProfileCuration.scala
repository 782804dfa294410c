package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev guard: the round-16 curation entries at scale — `graft.
  * ProfileCuration [sfDir]` (default /tmp/sfbig; run again at
  * /tmp/sfbig1m for the 10× growth rows). Times:
  *   - bpe_first_pass   the corpus-sized distinct-word count q150's
  *                      training opens with (the only pass that grows
  *                      with the corpus)
  *   - bpe_six_rounds   the 6 merge rounds on the checkpointed vocab
  *                      frame — the claim: corpus-size-INDEPENDENT
  *                      (Zipf-bounded), so a 32k-round production train
  *                      prices off this number, not the corpus
  *   - mine_negatives   q149 over the dir's embeddings (8 anchors
  *                      broadcast, WindowGroupLimit top-k) — linear in
  *                      the corpus, quantizer build included
  *   - semantic_decon   semanticDeconFrom with a FIXED 100-vector eval
  *                      side (a benchmark suite does not grow with the
  *                      train set) — the zero-shuffle map-side fold,
  *                      linear in the corpus
  *   - learned_apply    q152's apply half: count the corpus under the
  *                      just-learned vocab through the q145 kernel
  */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    import graft.ops.{Similarity, TextOps}
    def time(l: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      val extra = r match { case n: Long => s" rows=$n"; case s: String => s" $s"; case _ => "" }
      println(f"$l%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s$extra")
      spark.sharedState.cacheManager.clearCache()
    }
    // bpe: split the corpus pass from the rounds by materializing the
    // word frame first (the same localCheckpoint the trainer takes)
    var learned: Seq[String] = Nil
    time("bpe_first_pass") {
      Tables.spread(spark, Tables.documents(spark, d), "doc_id")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("freq")).count()
    }
    time("bpe_six_rounds") {
      // full train (re-runs the first pass, so rounds ≈ this − first)
      val m = TextOps.bpeTrainMerges(spark, d)
      learned = m.map(_._4).distinct
      s"merges=${m.map(t => s"${t._2}+${t._3}").mkString(",")}"
    }
    time("mine_negatives") {
      Similarity.q149HardNegatives(spark, d).count()
    }
    // the q153 decomposition: persist the cell labels once, then time the
    // serve-only mining pass (artifact join + broadcast-anchor ranking)
    val cellRoot = java.nio.file.Files.createTempDirectory("cur_cells").toString
    time("mine_label_build") {
      Similarity.miningAssigned(spark, d).select("vec_id", "cell")
        .write.mode("overwrite").parquet(s"$cellRoot/cells")
    }
    time("mine_served") {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .withColumn("nrm", sqrt(expr("graft_dot(e, e)")))
        .filter(col("nrm") > 0)
      Similarity.miningRanked(
        emb.join(spark.read.parquet(s"$cellRoot/cells"), Seq("vec_id"))
          .select("vec_id", "e", "nrm", "cell")).count()
    }
    time("semantic_decon") {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .withColumn("nrm", sqrt(expr("graft_dot(e, e)")))
        .filter(col("nrm") > 0)
      Similarity.semanticDeconFrom(
        emb.filter(col("vec_id") >= 100), emb.filter(col("vec_id") < 100),
        0.35).count()
    }
    time("learned_apply") {
      import spark.implicits._
      val lens = learned.map(_.length).distinct.sorted
      TextOps.subwordVocabCounts(
        Tables.spread(spark, Tables.documents(spark, d), "doc_id")
          .select("doc_id", "text"),
        learned.toDF("v"), lens).count()
    }
    spark.stop()
  }
}
