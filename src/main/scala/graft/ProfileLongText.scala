package graft

import org.apache.spark.sql.SparkSession

/** Dev guard: the per-document text operators on the LONG-DOCUMENT corpus
  * (`graft.ProfileLongText [sfLongDir]`, default /tmp/sflong — generate
  * with [[GenLongDocs]]). The driver testdata caps documents at 598 chars,
  * so per-doc-quadratic hazards never show there; this probe is where they
  * become measurable. Run it on two corpora whose mean length differs 2×
  * (e.g. `GenLongDocs /tmp/sflong5 500 5000 15000` vs
  * `GenLongDocs /tmp/sflong10 500 10000 30000`): a linear-in-L operator
  * shows ~2× wall-clock, a quadratic one ~4× — the q95/q56 sorted-run
  * term counter was switched on exactly this measurement (BASELINE.md
  * round-13 anchors record the committed table: sorted-run 2.31 → 3.17 s
  * at 2× length vs the pre-r12 quadratic kernel's 126 → 430 s).
  *
  * Covers the judge-named long-doc set: q95 BM25 (term counting), q56
  * TF-IDF (same counter), q90 bigram top-k, q97 continuation counts, q98
  * source overlap, q102 Kneser–Ney, q104 trigram KN; `quad` mode adds the
  * pre-r12 tf kernel and the uncached-q102 head-to-heads.
  */
object ProfileLongText {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sflong")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s  ($r)")
    }
    val stats = Tables.documents(spark, d)
      .selectExpr("count(*) AS n", "avg(n_chars) AS avg_chars").head()
    println(s"corpus: ${stats.getLong(0)} docs, avg ${stats.getDouble(1).toLong} chars")
    // the tf kernel head-to-head: sorted-run counter vs the pre-round-12
    // per-distinct-token filter (kept here ONLY as the measurement target)
    import org.apache.spark.sql.functions._
    val docsW = Tables.spread(spark, Tables.documents(spark, d), "doc_id")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    time("tf kernel (sorted-run, current)")(
      graft.ops.TextOps.termCounts(docsW).count())
    if (args.length > 1 && args(1) == "quad")
      time("tf kernel (quadratic, pre-r12)")(docsW
        .select(col("doc_id"), explode(expr(
          "transform(array_distinct(w), t -> struct(t AS term, size(filter(w, x -> x = t)) AS tf))")).as("p"))
        .count())
    time("positional postings (sorted-run, r14)")(
      graft.ops.TextOps.positionalPostings(docsW).count())
    time("q117 phrase search")(graft.ops.Retrieval.q117PhraseSearch(spark, d).count())
    time("q95 bm25")(graft.ops.TextOps.q95Bm25(spark, d).count())
    time("q56 tfidf")(graft.ops.TextOps.q56Tfidf(spark, d).count())
    time("q90 bigram topk")(graft.ops.TextOps.q90BigramTopk(spark, d).count())
    time("q97 continuation")(graft.ops.TextOps.q97Continuation(spark, d).count())
    time("q98 source overlap")(graft.ops.TextOps.q98SourceOverlap(spark, d).count())
    time("q102 kneser-ney")(graft.ops.TextOps.q102KneserNey(spark, d).count())
    time("q104 kneser-ney3")(graft.ops.TextOps.q104KneserNey3(spark, d).count())
    time("q107 kn doc score")(graft.ops.TextOps.q107KnDocScore(spark, d).count())
    if (args.length > 1 && args(1) == "quad") {
      // the q102 cache head-to-head: the SAME plan minus the bigram-table
      // cache barrier — the corpus-wide explode+agg runs once per consumer
      // (4×) inside one job instead of once total (measurement target only)
      spark.catalog.clearCache()
      time("q102 (uncached bigram table)")({
        val bi = Tables.spread(spark, Tables.documents(spark, d), "doc_id")
          .select(split(col("text"), " ").as("w"))
          .select(explode(expr(
            "transform(slice(w, 1, size(w) - 1), (t, i) -> struct(t AS prev, element_at(w, i + 2) AS tok))")).as("b"))
          .groupBy(col("b.prev").as("prev"), col("b.tok").as("tok"))
          .agg(count(lit(1)).as("cvw"))
        val prevStats = bi.groupBy("prev")
          .agg(sum(col("cvw")).as("cv"), count(lit(1)).as("n1v"))
        val contStats = bi.groupBy("tok").agg(count(lit(1)).as("contw"))
        val types = bi.agg(count(lit(1)).as("b_types"))
        bi.join(prevStats, Seq("prev")).join(contStats, Seq("tok"))
          .crossJoin(broadcast(types))
          .withColumn("p_kn", round(
            expr("(CAST(cvw AS DOUBLE) - 0.75D) / CAST(cv AS DOUBLE)") +
              expr("(0.75D * CAST(n1v AS DOUBLE) / CAST(cv AS DOUBLE)) * " +
                "(CAST(contw AS DOUBLE) / CAST(b_types AS DOUBLE))"), 6))
          .orderBy(col("cvw").desc, col("prev"), col("tok"))
          .limit(100).count()
      })
    }
    spark.stop()
  }
}
