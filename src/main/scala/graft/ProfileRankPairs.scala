package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round-18 diagnosis): time `Dedup.dfRankPairs` standalone —
  * uncached vs cached input — to isolate the containment-artifact build's
  * straggler. `graft.ProfileRankPairs [sfDir]`. */
object ProfileRankPairs {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfreal")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Dedup
    val docs = Tables.spread(spark, Tables.documents(spark, d), "doc_id")
      .select("doc_id", "text").filter(col("doc_id") % 100 =!= 0)
    def t(tag: String)(b: => Unit): Unit = {
      val t0 = System.nanoTime(); b
      println(f"$tag%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    t("uncached")(println("  n=" + Dedup.dfRankPairs(Dedup.hashShingles(docs)).length))
    val h = Dedup.hashShingles(docs).cache()
    t("fill")(h.count())
    t("cached")(println("  n=" + Dedup.dfRankPairs(h).length))
    spark.stop()
  }
}
