package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev guard: where q131's time goes relative to the q82 kernel it rides —
  * `graft.ProfileTriangles [sfDir]` (default /tmp/sfbig). Seam
  * decomposition: (a) the directed-edge kernel alone (q82's cost, cached
  * count), (b) mutual-edge symmetrization from the cached edge list,
  * (c) triangles + coefficient from the cached mutual list, (d) the
  * self-contained q131 entry end-to-end. (b)+(c) bound the analytic's
  * marginal cost over the graph build — on n·k integer edge rows both
  * should be a small fraction of (a). BASELINE.md records the rows
  * (round-14). */
object ProfileTriangles {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Similarity
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s  ($r)")
    }
    val tk = Similarity.knnEdges(spark, d).select("query_id", "neighbor_id").cache()
    time("(a) directed kNN edges (kernel + cache)")(tk.count())
    val und = tk
      .select(least(col("query_id"), col("neighbor_id")).as("a"),
        greatest(col("query_id"), col("neighbor_id")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") === 2)
      .select("a", "b")
      .cache()
    time("(b) mutual symmetrization (from cached edges)")(und.count())
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val tri = und.as("e1").join(und.as("e2"), col("e1.b") === col("e2.a"))
      .join(und.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"), "left_semi")
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val pern = tri.select(col("x").as("v"))
      .unionAll(tri.select(col("y").as("v")))
      .unionAll(tri.select(col("z").as("v")))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
    time("(c) triangles + coefficient (from cached mutual)")(
      deg.join(pern, Seq("v"), "left")
        .select(col("v").as("vec_id"), col("deg"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"))
        .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    time("(d) q131 self-contained end-to-end")(
      Similarity.q131TriangleCount(spark, d)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
