package graft

import org.apache.spark.sql.SparkSession

/** Dev guard: kNN-graph ARTIFACT SERVING at anchor scale —
  * `graft.Profile94 [sfDir] [artifactDir]` (default /tmp/sfbig).
  *
  * Times the split the serving seam exists for: the corpus-squared edge
  * build (`knnGraphArtifact`) runs ONCE, then each graph analytic
  * (label propagation, PageRank) is served from the persisted n·k integer
  * rows. The claim: build ≈ the q82 anchor, each served analytic ≈ its
  * self-contained anchor MINUS the build — so k analytics cost
  * build + k·rounds instead of k·(build + rounds). Set SPARK_GRAFT_NLIST
  * per the BASELINE lever table for the corpus size.
  */
object Profile94 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sfbig")
    val art = if (args.length > 1) args(1) else "/tmp/knn_graph_artifact"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](what: String)(f: => T): T = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    timed("edge-artifact build (the once cost)") {
      graft.ops.Similarity.knnGraphArtifact(spark, sfDir, art)
    }
    val edges = spark.read.parquet(art)
    val lp = timed("label propagation SERVED from the artifact") {
      graft.ops.Similarity.q84LabelPropFrom(spark, sfDir, edges).count()
    }
    val pr = timed("pagerank SERVED from the artifact") {
      graft.ops.Similarity.q94PageRankFrom(spark, sfDir, edges).count()
    }
    println(s"rows: label_prop=$lp pagerank=$pr")
    spark.stop()
  }
}
