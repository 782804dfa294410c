package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev guard: the q134/q143 perceptual-hash near-dup seams —
  * `graft.ProfilePhash [sfDir]` (default /tmp/sfbig). Per band LAYOUT
  * (4×16 = q134, 2×32 = q143) the stage rows are: fingerprint pass, band
  * explode, banded candidate join, map-side hamming filter, survivor
  * dedup — the decomposition that caught the round-15 ordering bug
  * (dedup-before-verify shuffled every candidate row with both
  * fingerprint arrays attached: 31M candidates at 100k on the adversarial
  * corpus vs 118k hamming-≤8 survivors) and, run at 1M, the candidate-
  * mass collapse that justifies the q143 lever (4×16 measured 3.06B
  * candidates at 1M — quadratic in bucket depth). */
object ProfilePhash {
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
    for (nBands <- Seq(4, 2)) {
      val tag = s"${nBands}x${64 / nBands}"
      val fps = docs
        .filter(length(col("text")) > 0)
        .withColumn("fp", expr(graft.multimodal.MultimodalOps.phashFpExprFor(nBands)))
        .select(col("doc_id"), col("fp"))
      time(s"fingerprints_$tag") { fps.count() }
      val bands = fps.select(col("doc_id"), col("fp"),
        posexplode(col("fp")).as(Seq("b", "bv")))
      val joined = bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
          col("x.fp").as("fa"), col("y.fp").as("fb"))
      time(s"cand_join_$tag") { joined.count() }
      val filt = joined.withColumn("hamming", expr(
          "aggregate(zip_with(fa, fb, (x, y) -> CAST(bit_count(x ^ y) AS BIGINT)), " +
            "0L, (acc, v) -> acc + v)"))
        .filter(col("hamming") <= 8)
      time(s"survivors_$tag") { filt.dropDuplicates(Seq("a_id", "b_id")).count() }
      time(s"end_to_end_$tag") {
        graft.multimodal.MultimodalOps.phashPairs(docs, nBands = nBands).count()
      }
    }
    spark.stop()
  }
}
