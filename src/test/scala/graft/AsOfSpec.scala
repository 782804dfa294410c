package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.AsOf

/** The bucketed as-of join must be result-identical to the naive
  * nested-loop (BETWEEN + rank) formulation. */
class AsOfSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("bucketed as-of equals nested-loop as-of (keyed, events)") {
    val spark = TestSpark.spark
    val ev = Tables.events(spark, sf).withColumn("ts_s", expr("ts_ns div 1000000000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_s"))
    val views = ev.filter(col("event_type").isin("view", "click"))
      .select(col("event_id").as("prev_event_id"), col("user_id"),
        col("ts_s").as("prev_ts_s"))

    val bucketed = AsOf.joinNearest(purchases, views,
        leftId = "event_id", leftTime = "ts_s", rightTime = "prev_ts_s",
        maxGap = 3600L, keys = Seq("user_id"), tieBreak = "prev_event_id")
      .select("event_id", "prev_event_id", "gap")
      .orderBy("event_id").collect().map(_.toSeq)

    // naive: cross product + filter + rank (the reference's shape)
    val naive = purchases.join(views, Seq("user_id"))
      .withColumn("gap", col("ts_s") - col("prev_ts_s"))
      .filter(col("gap").between(0, 3600))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_id")
          .orderBy(col("gap").asc, col("prev_event_id").desc)))
      .filter(col("rn") === 1)
      .select("event_id", "prev_event_id", "gap")
      .orderBy("event_id").collect().map(_.toSeq)

    assert(bucketed.toSeq == naive.toSeq)
    assert(bucketed.nonEmpty)
  }

  test("keyless as-of: bucket is the only join key, plan has no nested loop") {
    val spark = TestSpark.spark
    val ev = Tables.events(spark, sf).withColumn("ts_s", expr("ts_ns div 1000000000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts_s"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts_s").as("err_ts"))
    val res = AsOf.joinNearest(purchases, errors,
      leftId = "event_id", leftTime = "ts_s", rightTime = "err_ts",
      maxGap = 7200L, keys = Nil, tieBreak = "err_id")
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"expected equi-join plan, got:\n$plan")
    res.collect().foreach { r =>
      val g = r.getAs[Long]("gap"); assert(g >= 0 && g <= 7200)
    }
  }

  test("q85: bucketed overlap join equals the naive all-pairs interval scan") {
    val spark = TestSpark.spark
    val got = AsOf.q85OverlapJoin(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_a"), r.getAs[Long]("session_a"),
        r.getAs[Long]("user_b"), r.getAs[Long]("session_b"),
        r.getAs[Long]("overlap_s"))).toSeq
    assert(got.nonEmpty, "overlap gate must not be vacuous at sf0.001")
    // brute force over the collected session table: every cross-user pair,
    // inequality predicate only — the formulation the bucketing replaces
    val sess = graft.ops.Corpus.sessions(Tables.events(spark, sf), 1800L).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("start_s"), r.getAs[Long]("end_s")))
    val naive = (for {
      (ua, sa, a0, a1) <- sess
      (ub, sb, b0, b1) <- sess
      if ua < ub && a0 <= b1 && b0 <= a1
    } yield (ua, sa, ub, sb, math.min(a1, b1) - math.max(a0, b0)))
      .sortBy(t => (t._1, t._2, t._3, t._4)).toSeq
    assert(got == naive)
    // multi-bucket pairs are attributed exactly once (no distinct in the
    // plan, so a double-count would surface as a duplicate row here)
    assert(got.distinct.size == got.size)
  }

  test("q85 skew: a season-long hot session stays exact and AQE splits the hot bucket") {
    val spark = TestSpark.spark
    val s = spark; import s.implicits._
    // 300 users with short sessions piled into the SAME 900s bucket (the
    // hot bucket every realistic corpus has: the traffic spike), plus one
    // user whose single session spans an entire season — the worst-case
    // interval for bucketed expansion: it replicates into ~17k buckets
    // and overlaps every other session
    val short = (1 to 300).map(u =>
      (u.toLong, 0L, 3600L + (u % 30) * 10L, 3600L + (u % 30) * 10L + 400L))
    val hot = Seq((100000L, 0L, 0L, 180L * 24 * 3600))
    val sess = (short ++ hot).toDF("user_id", "session_id", "start_s", "end_s")
      .repartition(4, col("user_id"))
    val conf = Seq(
      // make the join a shuffle join (not broadcast) and drop AQE's skew
      // thresholds to test scale so the hot bucket's partition is split;
      // 64 shuffle partitions spread the season session's 17k bucket rows
      // thin so the hot bucket's partition is the clear outlier (at prod
      // scale the same ratio arises from the traffic spike itself)
      "spark.sql.shuffle.partitions" -> "64",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.5",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = AsOf.overlapPairs(sess)
      val got = df.collect()
        .map(r => (r.getAs[Long]("user_a"), r.getAs[Long]("session_a"),
          r.getAs[Long]("user_b"), r.getAs[Long]("session_b"),
          r.getAs[Long]("overlap_s"))).toSeq.sorted
      val all = short ++ hot
      val naive = (for {
        (ua, sa, a0, a1) <- all
        (ub, sb, b0, b1) <- all
        if ua < ub && a0 <= b1 && b0 <= a1
      } yield (ua, sa, ub, sb, math.min(a1, b1) - math.max(a0, b0))).sorted
      assert(naive.size > 40000, s"degenerate fixture: ${naive.size} pairs")
      assert(got == naive, "skewed bucketed overlap diverged from the naive scan")
      // the executed adaptive plan actually split the skewed partition —
      // the claim that residual hot buckets are AQE territory, not a
      // repartition-by-hand problem
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("skew="), s"no AQE skew split in plan:\n${p.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
