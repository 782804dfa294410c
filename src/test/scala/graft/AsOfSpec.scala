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
}
