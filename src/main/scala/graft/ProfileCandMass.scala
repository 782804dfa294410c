package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: the All-Pairs candidate-mass budget check at scale —
  * `graft.ProfileCandMass [sfDir]` (default /tmp/sfbig1m). Runs the
  * budgeted entry with a budget of 1 so the refusal fires and prints the
  * measured mass; the wall time of the refusal IS the probe's price (the
  * claim: seconds, vs the >79 GB spill death the unguarded 1M run
  * measured — BASELINE.md round-16 addendum). */
object ProfileCandMass {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfbig1m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sh = graft.ops.Dedup.shingleDocs(
      Tables.spread(spark, Tables.documents(spark, d), "doc_id"))
    val t0 = System.nanoTime()
    try {
      // the gate is in-plan now: the refusal fires at action time, still
      // before any candidate pair shuffles — drive it with a noop write
      graft.ops.Dedup.jaccardPairsBudgeted(sh, 0.6, maxCandidatePairs = 1)
        .write.format("noop").mode("overwrite").save()
      println("UNEXPECTED: under budget at 1")
    } catch {
      case e: Throwable if graft.ops.Dedup.budgetRefusal(e).isDefined =>
        println(f"refused in ${(System.nanoTime() - t0) / 1e9}%.2f s: " +
          graft.ops.Dedup.budgetRefusal(e).get.take(200))
    }
    spark.stop()
  }
}
