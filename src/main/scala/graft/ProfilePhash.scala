package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev guard: the q134 perceptual-hash near-dup seams at 100k docs —
  * `graft.ProfilePhash [sfDir]` (default /tmp/sfbig). Stage rows:
  * fingerprint pass, band explode, banded candidate join, map-side
  * hamming filter, survivor dedup — the decomposition that caught the
  * round-15 ordering bug (dedup-before-verify shuffled every candidate
  * row with both fingerprint arrays attached: 31M candidates at 100k on
  * the adversarial corpus vs 118k hamming-≤8 survivors). */
object ProfilePhash {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(l: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      val extra = r match { case n: Long => s" rows=$n"; case _ => "" }
      println(f"$l%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s$extra")
      spark.sharedState.cacheManager.clearCache()
    }
    val docs = Tables.spread(spark, Tables.documents(spark, d), "doc_id")
    val fps = docs
      .filter(length(col("text")) > 0)
      .withColumn("fp", expr(graft.multimodal.MultimodalOps.phashFpExpr))
      .select(col("doc_id"), col("fp"))
    time("fingerprints") { fps.count() }
    val bands = fps.select(col("doc_id"), col("fp"),
      posexplode(col("fp")).as(Seq("b", "bv")))
    time("bands") { bands.count() }
    val joined = bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.fp").as("fa"), col("y.fp").as("fb"))
    time("cand_join") { joined.count() }
    val filt = joined.withColumn("hamming", expr(
        "aggregate(zip_with(fa, fb, (x, y) -> CAST(bit_count(x ^ y) AS BIGINT)), " +
          "0L, (acc, v) -> acc + v)"))
      .filter(col("hamming") <= 8)
    time("hamming_filter") { filt.count() }
    time("dedup") { filt.dropDuplicates(Seq("a_id", "b_id")).count() }
    time("q134_end_to_end") {
      graft.multimodal.MultimodalOps.q134PhashNearDup(spark, d).count()
    }
    spark.stop()
  }
}
