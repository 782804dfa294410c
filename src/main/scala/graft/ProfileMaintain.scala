package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev guard: the IVF maintenance actions at scale — `graft.ProfileMaintain
  * [sfDir]` (default /tmp/sfbig; run again at /tmp/sfbig1m for the 10×
  * growth rows). Times, against a freshly built q74-family artifact:
  *   - build_ivf        the index build the premiums are measured against
  *   - split_artifact   ivfCellSplitArtifact (top-2 hot cells, CoW) — the
  *                      q142 premium, re-anchored beside the merge
  *   - merge_artifact   ivfCellMergeArtifact (bottom-2 cold cells, CoW) —
  *                      q144's action, NEW at this tier
  *   - maintain_pass    maybeMaintainIvf on a copy (compact no-op + split
  *                      tier + merge floor) — one quiet-window pass
  * The claim: both maintenance actions stay a bounded multiple of the
  * build they maintain (the r15 split rows measured 1.6–2.2×), because
  * each touches only its target cells' members plus one routing-column
  * rewrite of the codes table. */
object ProfileMaintain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    import graft.ops.Similarity
    def time(l: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      val extra = r match { case n: Long => s" rows=$n"; case _ => "" }
      println(f"$l%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s$extra")
      spark.sharedState.cacheManager.clearCache()
    }
    val root = "/tmp/graft_maintain_profile"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val (emb, subs, seedsPq) = Similarity.pqParts(spark, d)
    val embSlim = emb.select("vec_id", "e")
    time("build_ivf") {
      val (cents, books, codeTable) = Similarity.ivfPqIndex(emb, subs, seedsPq)
      cents.write.parquet(s"$root/a/cents")
      books.write.parquet(s"$root/a/books")
      codeTable.write.parquet(s"$root/a/codes")
    }
    time("split_artifact") {
      Similarity.ivfCellSplitArtifact(spark, s"$root/a", s"$root/split", embSlim)
    }
    time("merge_artifact") {
      Similarity.ivfCellMergeArtifact(spark, s"$root/a", s"$root/merge", embSlim)
    }
    // one combined quiet-window pass on an in-place copy: compaction
    // no-ops (no tombstones), the split tier and merge floor both fire
    org.apache.hadoop.fs.FileUtil.copy(
      new org.apache.hadoop.fs.Path(s"$root/a").getFileSystem(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(s"$root/a"),
      new org.apache.hadoop.fs.Path(s"$root/a").getFileSystem(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(s"$root/b"), false,
      spark.sparkContext.hadoopConfiguration)
    time("maintain_pass") {
      Similarity.maybeMaintainIvf(spark, s"$root/b", embSlim,
        maxTombstones = 4, maxSharePpm = 60000, minSharePpm = 30000).toString
    }
    val occ = spark.read.parquet(s"$root/b/codes").groupBy("cell").count()
      .agg(count(lit(1)), max("count"), sum("count")).head()
    println(s"post-maintain: ${occ.getLong(0)} cells, max ${occ.getLong(1)}, " +
      s"mass ${occ.getLong(2)}")
    // the FLEET form: the SAME policy pass through the versioned-root
    // protocol — maintain_versioned − maintain_pass is the measured
    // reader-isolation premium (clone the artifact into the unpublished
    // next version + publish + pointer flip; object stores copy
    // server-side, so the local-copy number is the premium's ceiling)
    val base = s"$root/ver"
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(hconf)
    val v = graft.ops.RootPointer.nextVersion(spark, base)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$root/a"), fs,
      new org.apache.hadoop.fs.Path(s"$base/$v"), false, hconf)
    graft.ops.RootPointer.publish(spark, base, v)
    time("maintain_versioned") {
      Similarity.maybeMaintainIvfVersioned(spark, base, embSlim,
        maxTombstones = 4, maxSharePpm = 60000, minSharePpm = 30000).toString
    }
    // residual variant: the plain rows above are routing-only rewrites;
    // these RE-ENCODE the routed members (split: both halves of each hot
    // cell; merge: moved members) — the premium is what re-encoding costs
    // on top of routing, and the audit row prices the full-artifact
    // invariant check a migration would run
    val rroot = s"$root/r"
    time("build_residual") {
      val (rc, rb, rcodes) = Similarity.residualParts(spark, d)
      rc.write.parquet(s"$rroot/cents")
      rb.write.parquet(s"$rroot/books")
      rcodes.write.parquet(s"$rroot/codes")
      Similarity.markResidual(spark, rroot)
    }
    time("split_residual") {
      Similarity.ivfCellSplitResidual(spark, rroot, s"$root/rsplit", embSlim)
    }
    time("merge_residual") {
      Similarity.ivfCellMergeResidual(spark, rroot, s"$root/rmerge", embSlim).size.toLong
    }
    time("audit_residual") {
      Similarity.residualAuditMismatches(spark, rroot, embSlim)
    }
    spark.stop()
  }
}
