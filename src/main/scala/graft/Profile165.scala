package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev guard: PHASE SPLIT of the q165 residual-split lifecycle —
  * `graft.Profile165 [sfDir] [reps]`.
  *
  * q165 is the heaviest bench entry (7.4 s at r19); the verdict asked for
  * the split: trio build + artifact writes, versioned maintenance (clone,
  * 2-means split + re-encode, pre-commit audit, publish), and the
  * full-probe refine serve (counts + ADC shortlist + exact re-rank).
  * Each phase is timed against the SAME lifecycle the entry runs;
  * phases after the first depend on the previous phase's writes, so the
  * wall split is honest (no overlap across the printed boundaries). */
object Profile165 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (rep <- 1 to reps) {
      println(s"rep $rep")
      spark.catalog.clearCache()
      graft.ops.CacheBin.release()
      val s = spark
      val base = s"${graft.ops.Similarity.knnGraphServePath(sfDir)}/ivfressplit_prof$rep"
      val (cents, books, codes) =
        timed("trio plan (residualPartsCached — lazy)") {
          graft.ops.Similarity.residualPartsCached(s, sfDir)
        }
      val v = graft.ops.RootPointer.nextVersion(s, base)
      timed("trio writes (writeIvfArtifacts, overlapped)") {
        graft.ops.Similarity.writeIvfArtifacts(s"$base/$v", cents, books, codes)
      }
      timed("mark + publish") {
        graft.ops.Similarity.markResidual(s, s"$base/$v")
        graft.ops.RootPointer.publish(s, base, v)
      }
      val emb = graft.ops.Similarity.embWithNorm(s, sfDir).select("vec_id", "e")
      // the versioned maintenance pass, unrolled with timers (the same
      // sequence maybeMaintainIvfVersioned runs)
      locally {
        graft.ops.RootPointer.cleanStaging(s, base)
        val cur = graft.ops.RootPointer.resolve(s, base)
        val next = graft.ops.RootPointer.nextVersion(s, base)
        val staging = s"$base/$next"
        timed("maintain: clone (copyDir)") {
          graft.ops.RootPointer.copyDir(s, cur, staging)
        }
        new org.apache.hadoop.fs.Path(staging).getFileSystem(
          s.sparkContext.hadoopConfiguration).delete(
          new org.apache.hadoop.fs.Path(s"$staging/${graft.ops.RootPointer.Complete}"), true)
        timed("maintain: compact check (no tombstones)") {
          graft.ops.Similarity.maybeCompactIvf(s, staging, 1)
        }
        timed("maintain: maybeSplitIvf (occupancy + 2-means + re-encode writes + audit + swap)") {
          require(graft.ops.Similarity.maybeSplitIvf(s, staging, emb, maxSharePpm = 1L))
        }
        timed("maintain: publish") {
          graft.ops.RootPointer.publish(s, base, next)
        }
        timed("audit cost estimate (residualAuditMismatches on published root)") {
          require(graft.ops.Similarity.residualAuditMismatches(s, staging, emb) == 0L)
        }
      }
      val root = timed("retire + resolve") {
        graft.ops.RootPointer.retireOld(s, base, keep = 2)
        graft.ops.RootPointer.resolve(s, base)
      }
      val queries = emb.filter(col("vec_id") < graft.ops.Similarity.AdcQueries)
      val (nlist, r) = timed("serve: nlist/corpus counts") {
        (s.read.parquet(s"$root/cents").count().toInt,
          s.read.parquet(s"$root/codes").count().toInt)
      }
      val shortlist = graft.ops.Similarity.residualSearchFrom(
        s.read.parquet(s"$root/cents"), s.read.parquet(s"$root/books"),
        s.read.parquet(s"$root/codes"), queries, nprobe = nlist, k = r)
        .select(col("query_id"), col("neighbor_id"))
      timed("serve: ADC shortlist alone (noop)") {
        shortlist.write.format("noop").mode("overwrite").save()
      }
      import org.apache.spark.sql.expressions.Window
      val q = queries.select(col("vec_id").as("query_id"), col("e").as("eq"))
      val corp = emb.select(col("vec_id").as("neighbor_id"), col("e").as("en"))
      val w = Window.partitionBy("query_id").orderBy(col("exact_fixed"), col("neighbor_id"))
      val refined = corp.join(broadcast(shortlist), Seq("neighbor_id"))
        .join(broadcast(q), Seq("query_id"))
        .withColumn("exact_fixed", expr(
          s"CAST(floor((graft_dot(eq, eq) - 2 * graft_dot(eq, en) + graft_dot(en, en)) * ${graft.ops.Similarity.CentFixedScale}) AS BIGINT)"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= graft.ops.Similarity.AdcK)
        .select("query_id", "neighbor_id", "exact_fixed", "rn")
        .orderBy("query_id", "rn")
      timed("serve: full refine (shortlist recomputed + exact re-rank, noop)") {
        refined.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
