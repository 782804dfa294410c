package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev guard: the positional-postings kernel head-to-head on the
  * long-document corpora (`graft.ProfilePositional [sfLongDir]`) —
  * best-of-3 STEADY-STATE per variant, because single-shot timings
  * mis-rank these kernels by 3–6×: whole-stage-codegen + JIT warmup
  * lands on whichever heavy lambda kernel runs FIRST in the JVM (a
  * round-14 session first "measured" the struct sort quadratic at 4.1×
  * and later "unstable" at 8–37 s on identical input — every one of
  * those samples was warmup/host-load contamination; BASELINE.md
  * round-14 records the corrected table). Steady-state: the struct sort
  * is linear (1.67 → 2.82 s at 2× doc length) and ~20% faster than the
  * string-encoded alternative, so it is the shipped kernel
  * ([[graft.ops.TextOps.positionalPostings]]). Variants:
  *   struct   — the shipped kernel: sort (term, pos) structs
  *   string   — rejected: sort `term ⧺ U+0001 ⧺ zero-padded-pos`
  *              strings; slightly slower AND needs a separator contract
  *   shuffle  — posexplode + groupBy collect_list: fastest at this
  *              500-doc probe scale but shuffles the whole token
  *              stream — the 100 TB anti-pattern, reference only
  */
object ProfilePositional {
  private val Sep = "\u0001"

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sflong5")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // steady-state best-of-3 per variant: the FIRST heavy lambda kernel in
    // a JVM pays whole-stage-codegen + JIT warmup (measured 3–6× on these
    // kernels), so single-shot timings are ordering artifacts, not kernel
    // properties — exactly the contamination that mis-ranked the two
    // kernels during round 14 (see BASELINE.md round-14)
    def time(label: String)(f: => Any): Unit = {
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        spark.sharedState.cacheManager.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-10s min ${samples.min}%7.2f s  (samples ${samples.map(s => f"$s%.2f").mkString(", ")})")
    }
    val docsW = Tables.spread(spark, Tables.documents(spark, d), "doc_id")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    println(s"corpus: $d")

    time("struct")(graft.ops.TextOps.positionalPostings(docsW).count())

    time("string")(docsW
      .filter(size(col("w")) > 0)
      .withColumn("ws", expr(
        s"array_sort(zip_with(w, sequence(1, size(w)), (t, p) -> concat(t, '$Sep', lpad(CAST(p AS STRING), 9, '0'))))"))
      .withColumn("st", expr(
        s"filter(transform(ws, (x, i) -> struct(substring_index(x, '$Sep', 1) AS term, i AS i)), " +
          s"p -> p.i = 0 OR substring_index(element_at(ws, p.i), '$Sep', 1) <> p.term)"))
      .select(col("doc_id"), explode(expr(
        s"zip_with(st, concat(slice(st, 2, size(st)), array(struct('' AS term, size(ws) AS i))), " +
          s"(a, b) -> struct(a.term AS term, transform(slice(ws, a.i + 1, b.i - a.i), " +
          s"x -> CAST(substring_index(x, '$Sep', -1) AS INT)) AS positions))")).as("p"))
      .count())

    time("shuffle")(docsW
      .select(col("doc_id"), posexplode(col("w")).as(Seq("i", "term")))
      .groupBy("doc_id", "term").agg(collect_list(col("i") + 1).as("positions"))
      .count())
    spark.stop()
  }
}
