package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev guard: stage-level timing of the collapsed-jaccard path (q42) —
  * `graft.Profile42 [sfDir]`. Splits grp / rep-pair / full-collapsed / plain
  * timings so a regression points at its stage. Found the AQE single-
  * partition collapse of the rep stage (fixed by the re-spread in
  * `Dedup.collapsedJaccardPairs`). */
object Profile42 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s  ($r)")
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      spark.catalog.clearCache()
      val docs = Tables.spread(spark, Tables.documents(spark, d), "doc_id")
      val grp = docs
        .filter(size(split(col("text"), " ")) >= 3)
        .groupBy("text")
        .agg(min(col("doc_id")).as("gid"), collect_list(col("doc_id")).as("members"))
        .cache()
      time("grp count")(grp.count())
      val reps = grp.select(col("gid").as("doc_id"), col("text"))
      val sh = graft.ops.Dedup.shingleDocs(reps)
      time("repPairs")(graft.ops.Dedup.jaccardPairs(sh, 0.6).count())
      time("full collapsed")(graft.ops.Dedup.collapsedJaccardPairs(docs, 0.6).count())
      time("plain q24")(graft.ops.Dedup.jaccardPairs(
        graft.ops.Dedup.shingleDocs(docs), 0.6).count())
    }
    spark.stop()
  }
}
