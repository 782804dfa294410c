package graft

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: REAL-CODEC decode + fingerprint throughput at corpus scale —
  * the round-16 gap (f) closer. q146 proves the `javax.imageio` decode →
  * [[graft.multimodal.Multimodal.aHash64]] → banding path correct over 40
  * PNGs; this measures what the SAME mapPartitions batch stage (the
  * production shape: codec context per partition, rows streamed through)
  * costs per 100k images, then runs the banded dedup end-to-end through
  * the BUDGETED kernel on the real-codec fingerprints and reports recall
  * on the planted re-render pairs.
  *
  * `graft.ProfilePhashReal [nImages]` (default 100000). Corpus = q146's
  * synthesized-PNG geometry at scale (id ≡ 0 base / 1 re-render at 32×24 /
  * 2 unrelated / 3 inverted), deterministic at any n. Prints:
  *   - decode_fp      wall-clock + images/s for synth+decode+aHash64+band
  *                    (synthesis ≈ one extra PNG encode per image, so the
  *                    decode-only rate is ≥ the printed rate)
  *   - band_mass      Σ C(n,2) candidate upper bound (the budget probe)
  *   - banded_pairs   end-to-end survivors through bandPairsBudgeted
  *   - recall         planted re-render pairs recovered THROUGH banding /
  *                    planted total; inverted-pair hits (must be 0)
  */
object ProfilePhashReal {

  /** q146's group geometry (base / re-render / unrelated / inverted) over
    * a DIVERSE pattern family: the committed q146 gradients collapse to a
    * handful of aHash fingerprints at corpus scale (mean-thresholding
    * cancels the per-group offset — measured: 64.5M survivor pairs at
    * 100k, everything resembles everything), which is a useful
    * ADVERSARIAL datapoint for the budget probe but not a realistic
    * image corpus. The x·y interaction term here gives ~1,001 distinct
    * shape families × per-group phases — fingerprints actually vary. */
  private def synthDiverse(id: Long): Array[Byte] = {
    val g = id / 4
    val kind = (id % 4).toInt
    // LOW-frequency content (8×8-px constant blocks, per-group pseudo-random
    // values): rescale-invariant by construction — every-other-pixel
    // sampling lands inside the same block, so the re-render's aHash is
    // bit-identical — while the ~48 block bits give corpus-scale
    // fingerprint diversity (a high-frequency texture decorrelates under
    // downscaling: measured 29% re-render recall on a first attempt)
    def cell(seed: Long, cx: Int, cy: Int): Int = {
      var h = seed * 0x9E3779B97F4A7C15L + cx * 0xC2B2AE3D27D4EB4FL +
        cy * 0x165667B19E3779F9L
      h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
      (h & 0xFF).toInt
    }
    def base(x: Int, y: Int): Int = cell(g, x / 8, y / 8)
    def vOf(x: Int, y: Int): Int = kind match {
      case 2 => cell(id * 31 + 7, x / 8, y / 8)
      case 3 => 255 - base(x, y)
      case _ => base(x, y)
    }
    val (w, h, sx) = if (kind == 1) (32, 24, 2) else (64, 48, 1)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = vOf(x * sx, y * sx) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.multimodal.{Multimodal, MultimodalOps}
    for (mode <- Seq("q146", "diverse")) {
      println(s"--- pattern=$mode ---")
      val t0 = System.nanoTime()
      // decode + raw 64-bit fingerprint ONCE; both band layouts repack it
      // map-side (round-18, verdict #7: the 2×32 lever measured on
      // REAL-codec fingerprints, both geometries)
      val raw = spark.range(n).select(col("id").as("doc_id"))
        .repartition(64, col("doc_id"))
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val png = if (mode == "q146") Multimodal.synthPng(id) else synthDiverse(id)
            (id, Multimodal.aHash64(png))
          }
        }(Encoders.product[(Long, Long)])
        .toDF("doc_id", "f").cache()
      val cnt = raw.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"decode_fp    $secs%8.2f s  ${cnt / secs}%.0f images/s ($cnt images)")
      for (nBands <- Seq(4, 2)) {
        val bw = 64 / nBands
        val fps = raw.select(col("doc_id"), expr(
          s"transform(sequence(0, ${nBands - 1}), " +
            s"b -> shiftrightunsigned(f, b * $bw) & ${(1L << bw) - 1}L)").as("fp"))
        val t1 = System.nanoTime()
        val mass = MultimodalOps.bandCandidateMass(fps)
        println(f"band_mass    ${(System.nanoTime() - t1) / 1e9}%8.2f s  " +
          f"layout=${nBands}x$bw mass=$mass")
        if (mass <= graft.ops.Dedup.defaultPairBudget) {
          val t2 = System.nanoTime()
          val pairs = MultimodalOps.bandPairsBudgeted(fps,
            graft.ops.Dedup.defaultPairBudget).cache()
          val survivors = pairs.count()
          println(f"banded_pairs ${(System.nanoTime() - t2) / 1e9}%8.2f s  " +
            f"layout=${nBands}x$bw survivors=$survivors")
          val planted = pairs.filter(col("a_id") % 4 === 0 && col("b_id") === col("a_id") + 1)
            .count()
          val inverted = pairs.filter(col("a_id") % 4 === 0 && col("b_id") === col("a_id") + 3)
            .count()
          println(s"recall       layout=${nBands}x$bw $planted/${n / 4} planted " +
            s"re-render pairs through banding; inverted hits=$inverted")
          pairs.unpersist(blocking = true)
        } else println(s"REFUSED layout=${nBands}x$bw: mass $mass over the default " +
          s"budget ${graft.ops.Dedup.defaultPairBudget} — the guard working")
      }
      raw.unpersist(blocking = true)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
