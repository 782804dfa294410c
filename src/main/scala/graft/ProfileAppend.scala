package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev guard: the incremental kNN-graph maintenance cost vs the rebuild it
  * replaces — `graft.ProfileAppend [sfDir] [nFresh]` (default /tmp/sfbig
  * 1000). Builds the scored edge artifact once (the one-time cost), then
  * times [[graft.ops.Similarity.knnGraphAppend]] folding nFresh seeded
  * vectors against a FULL rebuild over the union corpus under the same
  * frozen quantizer. The append's candidate volume is
  * |fresh|·(n/nlist)·nprobe + the n·k merge shuffle vs the rebuild's
  * n²·nprobe/nlist — at 100k vectors and 1% fresh the gap should be the
  * build:serve ratio of the artifact family. BASELINE.md records the
  * anchors (round-13). */
object ProfileAppend {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfbig")
    val nFresh = if (args.length > 1) args(1).toInt else 1000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Similarity
    graft.functions.VectorFunctions.register(spark)
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s  ($r)")
    }
    val art = java.nio.file.Files.createTempDirectory("prof_append").toString
    time("artifact build (once)")(Similarity.knnGraphArtifact(spark, d, s"$art/edges"))
    val base = Similarity.embWithNorm(spark, d)
      .filter(col("nrm") > 0).select("vec_id", "e", "nrm")
    val maxId = base.agg(max("vec_id")).head().getLong(0)
    // fresh batch: the GenEmbeddings id→vector scheme shifted past the corpus
    import spark.implicits._
    val fresh = spark.range(maxId + 1, maxId + 1 + nFresh).map { id =>
      val r = new java.util.Random(id * 2654435761L + 1)
      (id, Array.fill(64)(r.nextGaussian()))
    }.toDF("vec_id", "e")
    val edges = spark.read.parquet(s"$art/edges")
    val cents = spark.read.parquet(s"$art/edges_cents")
    time(s"append $nFresh fresh (recomputed assigns)")(
      Similarity.knnGraphAppend(spark, base, edges, cents, fresh)
        .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    val cellsTable = spark.read.parquet(s"$art/edges_cells")
    time(s"append $nFresh fresh (persisted probe-cell table)")(
      Similarity.knnGraphAppendFrom(spark, base, cellsTable, edges, cents, fresh)
        .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    val union = base.unionByName(fresh
      .withColumn("nrm", sqrt(expr("graft_dot(e, e)"))).filter(col("nrm") > 0))
    time("full rebuild over the union (same cents)")(
      Similarity.knnEdgesScoredFrom(spark, union, Similarity.ccRow(cents))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
