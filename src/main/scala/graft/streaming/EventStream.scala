package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.10 stretch): the batch `events`
  * pipeline re-expressed as an incremental stream.
  *
  * - `windowedCounts`: event-time tumbling-window aggregation with a
  *   watermark — the streaming shape of the batch groupBy; state is bounded
  *   by the watermark, so it runs forever at 100 TB/day ingest.
  * - `sessionize`: per-user session assembly via `flatMapGroupsWithState`
  *   with a processing-time-free, event-time-driven gap timeout — the
  *   canonical custom-state operator. `sessionizeTws` is the same operator
  *   on Spark 4's `transformWithState` (typed state handles; requires the
  *   RocksDB state store provider) — spec-asserted identical output.
  * - `Trigger.AvailableNow` processes the existing files then stops: the
  *   same code serves backfill (batch) and tail -f (continuous) — the
  *   Spark-native replacement for the reference's Airflow yearly-catchup
  *   re-ingest (dags/redskins-rule-dag.py:150-160).
  */
object EventStream {

  case class Event(event_id: Long, ts_us: Long, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start_us: Long, last_us: Long, n: Int, total: Double)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Int, total_value: Double)

  /** Raw events schema as stored when `ts` is TIMESTAMP(NANOS) → long with
    * nanosAsLong. Testdata has also shipped with TIMESTAMP(MICROS) `ts`
    * (TimestampType on arrival) — `readEvents` detects which via a batch
    * schema peek, mirroring `Tables.events`. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File stream over an events directory → typed events with a proper
    * event-time column. `readStream` needs an explicit schema, so peek the
    * actual on-disk type of `ts` with a batch footer read first (driver-side
    * listing only — no data scan), then normalize to the same (`ts_ns` long,
    * `ts` timestamp) pair `Tables.events` exposes. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // An existing-but-empty directory is a normal cold start for a file
    // stream (the sink side created the dir; producers haven't written
    // yet). The schema peek can't infer anything from zero footers, so
    // fall back to the NANOS rawSchema instead of throwing — exactly what
    // the stream will see once the first writer lands.
    val onDisk =
      try spark.read
        .option("pathGlobFilter", "events.parquet").parquet(dir).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.toLowerCase.contains("infer schema") => rawSchema
      }
    val in = spark.readStream
      .schema(onDisk)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (onDisk("ts").dataType == LongType)
      in.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    else
      in.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
  }

  /** Tumbling-window counts per event type with a 10-minute watermark.
    * Note Spark's watermark contract is one-directional: state for windows
    * behind the watermark is evicted (bounded state — the scale property),
    * but very-late input is only *eligible* for dropping, not guaranteed
    * dropped — a straggler can still surface as a tiny extra emission of an
    * expired window. Downstream consumers should upsert by window key. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** The one session fold both stateful operators run: sort the batch,
    * extend/close/open against the carried state, return (new state, closed
    * sessions). Shared by construction so the classic and transformWithState
    * operators cannot diverge. */
  private[streaming] def foldSessions(userId: Long, gapUs: Long,
      carried: Option[SessionState], batch: Iterator[Event])
      : (Option[SessionState], Seq[SessionOut]) = {
    val sorted = batch.toSeq.sortBy(e => (e.ts_us, e.event_id))
    val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    var cur = carried
    sorted.foreach { e =>
      cur match {
        case Some(st) if e.ts_us - st.last_us <= gapUs =>
          cur = Some(st.copy(last_us = e.ts_us, n = st.n + 1,
            total = st.total + e.value))
        case Some(st) =>
          closed += SessionOut(userId, st.start_us, st.last_us, st.n, st.total)
          cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
        case None =>
          cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
      }
    }
    (cur, closed.toSeq)
  }

  /** (event_id, ts_us, user_id, type, value) typed view keyed by user —
    * the common preamble of both sessionizers. */
  private def eventsByUser(spark: SparkSession, events: DataFrame) = {
    import spark.implicits._
    events
      .select(col("event_id"), expr("ts_ns div 1000").as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
  }

  /** Sessionization: events of one user belong to one session while gaps
    * stay under `gapMinutes`; emits a row per closed session. */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapMinutes: Long = 30): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    eventsByUser(spark, events)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val (cur, closed) = foldSessions(userId, gapUs, state.getOption, batch)
          cur.foreach(state.update)
          closed.iterator
      }
  }

  /** The same sessionizer on Spark 4's `transformWithState` — the
    * arbitrary-state API that supersedes flatMapGroupsWithState (typed
    * per-key `ValueState` handles, optional TTL, timers). Kept alongside the
    * classic operator so both state surfaces are exercised; the spec asserts
    * the two produce identical sessions. */
  class SessionProcessor(gapUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, SessionOut] {
    import org.apache.spark.sql.streaming.{TTLConfig, ValueState}
    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionOut] = {
      val carried = if (session.exists()) Some(session.get()) else None
      val (cur, closed) = foldSessions(userId, gapUs, carried, rows)
      cur.foreach(session.update)
      closed.iterator
    }
  }

  /** `sessionize` re-expressed on the transformWithState API. */
  def sessionizeTws(spark: SparkSession, events: DataFrame,
      gapMinutes: Long = 30): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    eventsByUser(spark, events)
      .transformWithState(new SessionProcessor(gapUs),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** Streaming exact dedup: drop duplicate event_ids with bounded state —
    * the watermark lets Spark evict ids older than the lateness horizon, so
    * state stays O(events-per-window) instead of growing forever (the
    * streaming counterpart of the batch `dropDuplicates`). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase joined to the same user's
    * views within the preceding hour. Both sides carry watermarks and the
    * join condition bounds event-time distance, so Spark can evict view
    * state once the purchase-side watermark passes `v_ts + 1h` — bounded
    * state at unbounded ingest, the streaming shape of the batch as-of
    * join (q15). */
  def joinPurchasesToViews(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("v_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
        (unix_timestamp(col("p_ts")) - unix_timestamp(col("v_ts"))).as("gap_s"),
        col("value"))
  }

  /** Drain all currently-available files into an in-memory table and stop;
    * returns the query name to read back via `spark.table`. */
  def runAvailableNow(spark: SparkSession, dir: String, queryName: String): Unit = {
    val q = windowedCounts(readEvents(spark, dir))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
