package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR and prints
  * ONE JSON line. Each query is fully executed via the built-in `noop` sink
  * (a `count()` would let Catalyst prune projections and skip most of the
  * work); a full untimed warm-up pass absorbs first-job costs (codegen,
  * file-index, JIT) so per-query numbers reflect steady state, and the
  * plan-keyed cache is cleared between queries so no measurement reuses
  * another's (or its own warm-up's) cached data.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // None = the query threw: a failure must surface in the JSON, never be
    // folded into the timings (a fast analysis error would otherwise record
    // as a large best-of-2 "speedup")
    def execute(name: String): Option[Double] = {
      val t0 = System.nanoTime()
      val ok =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          true
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      // queries that cache() internally must not hand their warm cache (or
      // their memory) to the next query — each measurement stands alone
      spark.catalog.clearCache()
      if (ok) Some(sec) else None
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // one untimed warm-up pass: JIT + codegen + file-index costs otherwise
    // land on whichever timed query first touches each codepath. Combined
    // with the two timed passes below, every query executes 3× — the
    // heaviest generated loops (array intersects, decimal aggs) reach C2
    // steady state on their third execution (measured: 10.9 → 2.0 → 1.45 s),
    // which the best-of-2 then records.
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }

    // best-of-2 timed passes: a transient hiccup (GC, background compile,
    // machine load) can multiply a single measurement several-fold — the
    // round-1 record showed 5.5 s for a query whose steady state is 0.9 s.
    // The min of two full interleaved passes is the standard robust estimator
    // for "what the query costs when nothing else interferes".
    val pass1 = names.map(n => n -> execute(n)).toMap
    val pass2 = names.map(n => n -> execute(n)).toMap
    val results = names.flatMap { n =>
      (pass1(n) ++ pass2(n)).minOption.map(n -> _)
    }
    val failed = names.filter(n => pass1(n).isEmpty && pass2(n).isEmpty)
    // a query that threw in exactly one pass still reports the surviving
    // pass's timing, but must be distinguishable from a clean query — an
    // intermittent failure (flaky OOM, nondeterministic plan error) would
    // otherwise never surface in the JSON
    val flaky = names.filter(n => pass1(n).isEmpty ^ pass2(n).isEmpty)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val flk = flaky.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"flaky":$flk,"sf":"$sfDir"}""")
    spark.stop()
  }
}
