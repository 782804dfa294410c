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

  /** q85: INTERVAL-OVERLAP join (range join) — which session pairs from
    * different users were active at the same time. The missing operator
    * class beside the as-of join: Spark has no native range join, and the
    * naive formulation (`a.start <= b.end AND b.start <= a.end`) has no
    * equi key, so Catalyst plans a BroadcastNestedLoopJoin — O(|A|·|B|)
    * compares, the 100-TB killer. Same cure as `joinNearest`: BUCKETED
    * EXPANSION. Each interval registers every `bucketS`-wide time bucket it
    * touches (`sequence(start div W, end div W)` — replication is
    * 1 + len/W, bounded because session length is gap-bounded), candidates
    * meet in an EQUI join on the bucket, and the true-overlap predicate
    * filters join-locally. Multi-bucket double-counting is eliminated
    * WITHOUT a distinct: a pair is attributed only to the bucket holding
    * the overlap's START (`greatest(a0,b0) div W == bkt` — a pure filter,
    * no extra shuffle). Work scales with Σ_bucket n_b², not |A|·|B|; W
    * trades interval replication against per-bucket density, and AQE
    * splits residual hot buckets.
    *
    * All arithmetic is integer epoch seconds (start/end/overlap_s) —
    * hash-exact cross-engine; the oracle states the SAME semantics as the
    * naive inequality join (DuckDB plans it as its native IEJoin), so the
    * gate proves the bucketed rewrite ≡ the textbook formulation. */
  private val OverlapBucketS = 900L

  /** The bucketed-expansion overlap core on any `(user_id, session_id,
    * start_s, end_s)` frame — factored so AsOfSpec can drive it with
    * synthetic skew (a season-long hot session) independent of the events
    * table. `bucketS` is the W lever: replication 1 + len/W per interval
    * vs Σ_bucket n_b² per-bucket density; residual hot buckets are AQE
    * skew-join territory (AsOfSpec demonstrates the split). */
  private[graft] def overlapPairs(sess: DataFrame,
      bucketS: Long = OverlapBucketS): DataFrame = {
    val a = sess.select(col("user_id").as("user_a"), col("session_id").as("session_a"),
      col("start_s").as("a0"), col("end_s").as("a1"))
      .withColumn("bkt", explode(expr(s"sequence(a0 div $bucketS, a1 div $bucketS)")))
    val b = sess.select(col("user_id").as("user_b"), col("session_id").as("session_b"),
      col("start_s").as("b0"), col("end_s").as("b1"))
      .withColumn("bkt", explode(expr(s"sequence(b0 div $bucketS, b1 div $bucketS)")))
    a.join(b, Seq("bkt"))
      .filter(col("user_a") < col("user_b"))
      .filter(col("a0") <= col("b1") && col("b0") <= col("a1"))
      .filter(expr(s"greatest(a0, b0) div $bucketS") === col("bkt"))
      .select(col("user_a"), col("session_a"), col("user_b"), col("session_b"),
        (least(col("a1"), col("b1")) - greatest(col("a0"), col("b0"))).as("overlap_s"))
  }

  def q85OverlapJoin(s: SparkSession, d: String): DataFrame =
    overlapPairs(Corpus.sessions(Tables.events(s, d), 1800L))
      .orderBy("user_a", "session_a", "user_b", "session_b")

  val q85Sql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |         epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS ts_s,
      |         LAG(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) OVER
      |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts_s
      |  FROM events),
      |f AS (
      |  SELECT user_id, event_id, ts, ts_s,
      |         CASE WHEN prev_ts_s IS NULL OR ts_s - prev_ts_s > 1800
      |              THEN 1 ELSE 0 END AS new_sess
      |  FROM g),
      |x AS (
      |  SELECT user_id, ts_s,
      |         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM f),
      |sess AS (
      |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |         MIN(ts_s) AS start_s, MAX(ts_s) AS end_s
      |  FROM x GROUP BY user_id, session_id)
      |SELECT a.user_id AS user_a, a.session_id AS session_a,
      |       b.user_id AS user_b, b.session_id AS session_b,
      |       least(a.end_s, b.end_s) - greatest(a.start_s, b.start_s) AS overlap_s
      |FROM sess a JOIN sess b
      |  ON a.user_id < b.user_id AND a.start_s <= b.end_s AND b.start_s <= a.end_s
      |ORDER BY user_a, session_a, user_b, session_b""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q39_asof_bucketed", q39AsofBucketed _, Some(Relational.q15Sql)),
    ("q85_overlap_join", q85OverlapJoin _, Some(q85Sql)),
  )
}
