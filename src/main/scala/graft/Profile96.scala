package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev guard: the HLL cardinality sketch at profiling scale —
  * `graft.Profile96 [nDistinct] [dupFactor]` (default 10M distinct keys,
  * each appearing twice = a 20M-row stream).
  *
  * Validates the three claims q96 makes far above its catalog input:
  *  - ONE pass over the stream builds the sketch through partial
  *    aggregation (a 4 KiB buffer per partition through the shuffle —
  *    never a per-key or per-bucket exchange);
  *  - the raw harmonic-mean estimate lands inside the m=4096 design band
  *    (σ ≈ 1.04/√m ≈ 1.6%) in its valid range n ≫ 2.5m;
  *  - duplicates do not move the estimate (register max is idempotent):
  *    the dup-factor pass over the same keys yields the identical sketch.
  */
object Profile96 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val dup = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.HllAgg.register(spark)

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // the q96 derivation over synthetic distinct keys; dupFactor repeats
    // every key (id mod n) so the stream has duplicates but n distincts
    def derived(rows: Long) = spark.range(0, rows, 1, 32)
      .selectExpr(s"md5(CAST(id % $n AS STRING)) AS fp")
      .selectExpr(
        "CAST(conv(substring(fp, 1, 3), 16, 10) AS BIGINT) AS bucket",
        "CAST(length(regexp_extract(substring(fp, 4, 13), '^0*', 0)) AS BIGINT) AS z",
        "substring(regexp_replace(substring(fp, 4, 13), '^0*', ''), 1, 1) AS nz")
      .selectExpr("bucket",
        """CASE WHEN z = 13 THEN CAST(50 AS BIGINT)
          |ELSE LEAST(z * 4 + CASE WHEN nz = '1' THEN 3
          |                        WHEN nz IN ('2','3') THEN 2
          |                        WHEN nz IN ('4','5','6','7') THEN 1
          |                        ELSE 0 END + 1, CAST(50 AS BIGINT)) END AS rho""".stripMargin)

    def sketch(rows: Long): (Long, Long) = {
      val st = derived(rows)
        .agg(expr("graft_hll_stats(graft_hll_agg(bucket, rho))").as("st"))
        .select(col("st.v_empty"), col("st.s_scaled")).head()
      (st.getLong(0), st.getLong(1))
    }

    val (v1, s1) = timed(s"sketch of $n distincts (1 pass)")(sketch(n))
    val est = 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0 *
      1125899906842624.0 / s1.toDouble
    val err = (est - n.toDouble) / n.toDouble
    println(f"estimate: ${est}%.0f vs exact $n (err ${err * 100}%+.2f%%, v_empty=$v1)")

    val (v2, s2) = timed(s"sketch of ${dup}x duplicated stream (${n * dup} rows)")(
      sketch(n * dup))
    println(s"duplicate idempotence: ${if ((v1, s1) == (v2, s2)) "IDENTICAL sketch" else s"DIVERGED ($v1,$s1) vs ($v2,$s2)"}")
    assert((v1, s1) == (v2, s2), "duplicates moved the sketch")
    assert(math.abs(err) < 0.05, s"estimate outside 5% at n=$n")
    spark.stop()
  }
}
