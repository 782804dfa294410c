package graft

import org.apache.spark.sql.SparkSession

/** Dev guard: the cluster-assignment kernel on a POWER-LAW graph —
  * `graft.Profile53Power [chainLen] [hubDegree]` (default 5000 / 500000).
  *
  * Profile53 measures the realistic near-dup mix (shallow stars). This
  * probe is the adversarial tail a crawl-scale corpus eventually serves:
  *   - one CHAIN component whose diameter (default 5000) blows far past the
  *     min-label kernel's 12-round cap — `clusterPairs` must detect the
  *     non-convergence and fall back to large-star/small-star instead of
  *     returning a half-propagated labeling;
  *   - one MEGA-STAR hub of default 500k members — the power-law head. The
  *     star steps are reduceByKey(min)+join (never groupByKey), so the
  *     hub's neighbor list never materializes in one task; this probe is
  *     the evidence for that claim at 5×10⁵ degree;
  *   - 10k small stars — the body, checking the fallback doesn't degrade
  *     the easy components while rescuing the hard ones.
  * Every component's expected label is known in closed form, so the check
  * is exact (zero mislabels) across ~1M edges.
  */
object Profile53Power {
  def main(args: Array[String]): Unit = {
    val chainLen = args.headOption.map(_.toInt).getOrElse(5000)
    val hubDeg = if (args.length > 1) args(1).toInt else 500000
    val smallComps = 10000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val MegaHub = 10000000L
    val SmallBase = 20000000L
    val chain = spark.range(1, chainLen).map(i => (i - 1, i.longValue))
    val mega = spark.range(1, hubDeg + 1).map(i => (MegaHub, MegaHub + i))
    val small = spark.range(0, smallComps).flatMap { c =>
      val hub = SmallBase + c * 100L
      (1 until 8).map(i => (hub, hub + i))
    }
    val pairs = chain.union(mega).union(small).toDF("a_id", "b_id")
    val nPairs = pairs.count()

    val t0 = System.nanoTime()
    val labels = graft.ops.Dedup.clusterPairs(pairs)
    val nClusters = labels.groupBy("cluster_id").count().count()
    val sec = (System.nanoTime() - t0) / 1e9
    // exact expected label per node: chain → 0, mega → hub, small → its hub
    val wrong = labels.filter(org.apache.spark.sql.functions.expr(
      s"""cluster_id != CASE
         |  WHEN doc_id < $chainLen THEN 0L
         |  WHEN doc_id >= $MegaHub AND doc_id < $SmallBase THEN ${MegaHub}L
         |  ELSE (doc_id div 100) * 100
         |END""".stripMargin)).count()
    val expClusters = 2 + smallComps
    println(f"$nPairs edges (chain=$chainLen, hub-degree=$hubDeg) -> " +
      f"$nClusters clusters in $sec%.1f s; mislabeled=$wrong")
    assert(nClusters == expClusters, s"expected $expClusters clusters, got $nClusters")
    assert(wrong == 0, "cluster labels wrong")

    // the fallback kernel alone on the same graph, for the cost split
    val t1 = System.nanoTime()
    val prdd = pairs.rdd.map(r => (r.getLong(0), r.getLong(1)))
    val starLabels = graft.ops.Dedup.starCluster(prdd)
    val nStar = starLabels.count()
    val sec2 = (System.nanoTime() - t1) / 1e9
    println(f"starCluster alone: $nStar labels in $sec2%.1f s")
    spark.stop()
  }
}
