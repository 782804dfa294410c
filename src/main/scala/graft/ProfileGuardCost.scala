package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: the marginal cost of the DEFAULT candidate-mass guard on the
  * banded one-shot families — `graft.ProfileGuardCost [sfDir] [runs]`.
  * Times the UNGUARDED round-16 shape of the MinHash pair query (no gate,
  * no collision prefilter — reconstructed inline below; the guarded form
  * is the live q25 entry) against the current guarded catalog entry, both
  * steady-state (cache cleared per run), so the guard premium is measured
  * on one host in one JVM instead of inferred across driver bench rounds. */
object ProfileGuardCost {
  private val NumHashes = 128
  private val NumBands = 32
  private val RowsPerBand = 4

  /** The round-16 q25: bucket self-join with NO mass guard. */
  private def unguardedMinhash(s: SparkSession, d: String): DataFrame = {
    graft.functions.MinHashAgg.register(s)
    val docs = graft.ops.Dedup.shingleDocs(
      Tables.spread(s, Tables.documents(s, d), "doc_id")).cache()
    val ex = docs.select(col("doc_id"),
      explode(expr("transform(shingles, x -> xxhash64(x))")).as("shh"))
    val sigs = ex.groupBy("doc_id")
      .agg(expr(s"graft_minhash(shh, $NumHashes)").as("mhs"))
    val buckets = sigs
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${NumBands - 1}), b -> xxhash64(slice(mhs, b * $RowsPerBand + 1, $RowsPerBand)))"))
        .as(Seq("band_id", "sig")))
    val candidates = buckets.as("a").join(buckets.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val da = docs.select(col("doc_id").as("a_id"), col("shingles").as("sa"), col("nsh").as("na"))
    val db = docs.select(col("doc_id").as("b_id"), col("shingles").as("sb"), col("nsh").as("nb"))
    candidates.join(da, "a_id").join(db, "b_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.6)
      .select("a_id", "b_id", "jaccard")
      .orderBy("a_id", "b_id")
  }

  /** Experimental gated shape: no caches anywhere, symmetric gate —
    * every consumer shares AQE's runtime-reused exchanges. */
  private def lazyGated(s: SparkSession, d: String): DataFrame = {
    graft.functions.MinHashAgg.register(s)
    val docs = graft.ops.Dedup.shingleDocs(
      Tables.spread(s, Tables.documents(s, d), "doc_id"))
    val ex = docs.select(col("doc_id"),
      explode(expr("transform(shingles, x -> xxhash64(x))")).as("shh"))
    val sigs = ex.groupBy("doc_id")
      .agg(expr(s"graft_minhash(shh, $NumHashes)").as("mhs"))
    val buckets = sigs
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${NumBands - 1}), b -> xxhash64(slice(mhs, b * $RowsPerBand + 1, $RowsPerBand)))"))
        .as(Seq("band_id", "sig")))
    val cnt = buckets.groupBy("band_id", "sig").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
    val gate = graft.ops.Dedup.budgetGate(
      cnt.agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)).as("m")),
      Long.MaxValue, "MinHash LSH", "lever")
    val g = graft.ops.Dedup.gatedBy(buckets, gate)
    val candidates = g.as("a").join(g.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val da = docs.select(col("doc_id").as("a_id"), col("shingles").as("sa"), col("nsh").as("na"))
    val db = docs.select(col("doc_id").as("b_id"), col("shingles").as("sb"), col("nsh").as("nb"))
    candidates.join(da, "a_id").join(db, "b_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.6)
      .select("a_id", "b_id", "jaccard")
      .orderBy("a_id", "b_id")
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // per-job wall times: where does the guard premium actually go
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val jobDesc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.put(js.jobId, System.nanoTime())
        jobDesc.put(js.jobId, js.stageInfos.map(si =>
          s"${si.name.takeWhile(_ != '\n').take(40)}[${si.numTasks}]").mkString(" | "))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobs.remove(je.jobId)
        if (t0 != 0L) jobLog.add(
          f"    job ${je.jobId}: ${(System.nanoTime() - t0) / 1e9}%.3f s  ${jobDesc.remove(je.jobId)}")
      }
    })
    def once(df: => DataFrame): Double = {
      spark.catalog.clearCache()
      jobLog.clear()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // interleaved A/B: host drift on this box swamps sequential blocks, so
    // every iteration runs both variants back-to-back and the PAIRED ratio
    // is the reported premium
    // interleave the shipped guarded entry against the unguarded r16 shape
    // and the fully-lazy negative result; paired ratios only
    once(unguardedMinhash(spark, d)); once(graft.ops.Dedup.q25DedupMinhash(spark, d))
    once(lazyGated(spark, d)) // warm
    val ratios = (1 to runs).map { i =>
      val u = once(unguardedMinhash(spark, d))
      val g = once(graft.ops.Dedup.q25DedupMinhash(spark, d))
      val l = once(lazyGated(spark, d))
      println(f"pair $i: unguarded $u%.2f s guarded $g%.2f s (${g / u}%.2f) lazy-uncached $l%.2f s (${l / u}%.2f)")
      if (i == runs) { println("  guarded jobs:"); jobLog.forEach(x => println(x)) }
      (g / u, l / u)
    }
    val gs = ratios.map(_._1).sorted; val ls = ratios.map(_._2).sorted
    println(f"median guarded: ${gs(gs.size / 2)}%.2f  lazy-uncached: ${ls(ls.size / 2)}%.2f")
    spark.stop()
  }
}
