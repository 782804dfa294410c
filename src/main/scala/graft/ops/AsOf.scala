package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Scale-safe as-of (nearest-preceding-within-window) join.
  *
  * The reference's formulation (`DATEDIFF BETWEEN 0 AND 30` + rank-1,
  * v2:274-292) forces a BroadcastNestedLoopJoin — O(|L|·|R|) compares. This
  * operator expresses the same semantics as an EQUI-join: both sides bucket
  * by `floor(time / maxGap)`; a right row at gap ∈ [0, maxGap] from a left
  * row lies in the left row's bucket or the one before, so joining on
  * (keys…, bucket) with the right side emitted into both its own and the
  * next bucket covers every candidate with ≤ 2× replication. Work scales
  * with matches, not with |L|·|R|, shuffles hash-partition on the bucket
  * (plus keys), and AQE handles residual bucket skew.
  */
object AsOf {

  /** For each left row (identified by unique `leftId`): the nearest right
    * row with `0 ≤ leftTime − rightTime ≤ maxGap`, matching equal values on
    * `keys` (pass Nil for a keyless as-of — the bucket itself becomes the
    * join key). Times are numeric (epoch seconds, days — any consistent
    * unit). Adds a `gap` column; ties on gap break toward the larger
    * `tieBreak` value. Left rows with no match are dropped (inner as-of). */
  def joinNearest(
      left: DataFrame, right: DataFrame,
      leftId: String, leftTime: String, rightTime: String,
      maxGap: Long, keys: Seq[String], tieBreak: String): DataFrame = {
    require(maxGap > 0, "maxGap must be positive")
    val lb = left.withColumn("_lb", floor(col(leftTime) / maxGap))
    // right rows serve their own bucket and the next one
    val rb = right
      .withColumn("_shift", explode(array(lit(0L), lit(1L))))
      .withColumn("_lb", floor(col(rightTime) / maxGap) + col("_shift"))
      .drop("_shift")
    val joined = lb.join(rb, (keys :+ "_lb").toSeq)
      .withColumn("gap", col(leftTime) - col(rightTime))
      .filter(col("gap").between(0, maxGap))
    val w = Window.partitionBy(col(leftId))
      .orderBy(col("gap").asc, col(tieBreak).desc)
    joined
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_lb")
  }

  /** Catalog query: the bucketed as-of join on the q15 workload (purchase →
    * nearest preceding view/click by the same user within 1 h). Identical
    * semantics and output to q15's windowed interval join — it shares q15's
    * oracle — but the plan is an equi-join on (user_id, bucket): work scales
    * with matches, not |purchases|·|views|. */
  def q39AsofBucketed(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("ts_s", expr("ts_ns div 1000000000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_s"))
    val views = ev.filter(col("event_type").isin("view", "click"))
      .select(col("event_id").as("prev_event_id"), col("user_id"),
        col("ts_s").as("prev_ts_s"))
    joinNearest(purchases, views,
      leftId = "event_id", leftTime = "ts_s", rightTime = "prev_ts_s",
      maxGap = 3600L, keys = Seq("user_id"), tieBreak = "prev_event_id")
      .select(col("event_id"), col("user_id"), col("prev_event_id"),
        col("gap").as("gap_s"))
      .orderBy("event_id")
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q39_asof_bucketed", q39AsofBucketed _, Some(Relational.q15Sql)),
  )
}
