package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}
