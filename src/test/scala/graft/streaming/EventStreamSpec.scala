package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

/** Streaming ≡ batch: the AvailableNow drain over the events directory must
  * produce exactly the batch aggregation's results. */
class EventStreamSpec extends AnyFunSuite with graft.CacheHygiene {
  private val sf = "/root/testdata/sf0.001"

  test("windowed counts via AvailableNow match the batch equivalent") {
    val spark = TestSpark.spark
    EventStream.runAvailableNow(spark, sf, "stream_counts")
    val streamed = spark.table("stream_counts")
      .orderBy("win_start", "event_type").collect().map(_.toSeq)

    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy("win_start", "event_type").collect().map(_.toSeq)

    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("readEvents cold-starts on an existing-but-empty directory") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.streaming.Trigger
    // a sink-created dir with no files yet is a NORMAL file-stream cold
    // start; the schema peek must fall back to rawSchema, not throw
    val dir = java.nio.file.Files.createTempDirectory("evt_cold").toString
    val in = EventStream.readEvents(spark, dir)
    assert(in.isStreaming)
    assert(Seq("ts_ns", "ts", "event_id").forall(in.schema.fieldNames.contains))
    // and the stream actually runs: zero input files drain to zero rows
    val q = EventStream.windowedCounts(in)
      .writeStream.format("memory").queryName("evt_cold")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("evt_cold").count() == 0)
  }

  test("streaming dedup with watermark preserves distinct events") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.streaming.Trigger
    val in = EventStream.readEvents(spark, sf)
    // duplicate every event by unioning the stream with itself
    val q = EventStream.dedupStream(in.union(in))
      .select("event_id")
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n = spark.table("stream_dedup").count()
    val distinct = Tables.events(spark, sf).select("event_id").distinct().count()
    assert(n == distinct)
  }

  test("stream-stream interval join matches the batch join exactly") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.streaming.Trigger
    val q = EventStream.joinPurchasesToViews(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("stream_enrich")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("stream_enrich")
      .orderBy("purchase_id", "view_id").collect().map(_.toSeq)

    val ev = Tables.events(spark, sf)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
    val batch = purchases.join(views,
        col("p_user") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("v_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
        (unix_timestamp(col("p_ts")) - unix_timestamp(col("v_ts"))).as("gap_s"),
        col("value"))
      .orderBy("purchase_id", "view_id").collect().map(_.toSeq)

    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("sessionization groups events by gap and conserves totals") {
    val spark = TestSpark.spark
    import spark.implicits._
    val sessions = EventStream.sessionize(
      spark, Tables.events(spark, sf), gapMinutes = 30)

    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    // drive it as a real stream over the same files
    val streamIn = EventStream.readEvents(spark, sf)
    val q = EventStream.sessionize(spark, streamIn)
      .writeStream.format("memory").queryName("stream_sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("stream_sessions").collect()

    // closed sessions only (the final open session per user stays in state);
    // every closed session must be well-formed and respect the 30-min gap
    out.foreach { r =>
      assert(r.getAs[Long]("start_us") <= r.getAs[Long]("end_us"))
      assert(r.getAs[Int]("n_events") >= 1)
    }
    // session count sanity: no more closed sessions than events
    val nEvents = Tables.events(spark, sf).count()
    assert(out.length < nEvents)
    assert(out.length > 0)
  }

  test("transformWithState sessionizer matches the classic stateful operator") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.streaming.Trigger
    def streamIn = EventStream.readEvents(spark, sf)
    def drain(name: String, ds: org.apache.spark.sql.Dataset[EventStream.SessionOut]): Seq[Seq[Any]] = {
      val q = ds.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name).orderBy("user_id", "start_us").collect().map(_.toSeq).toSeq
    }
    val classic = drain("tws_classic", EventStream.sessionize(spark, streamIn))
    // transformWithState needs the RocksDB provider (multi-column-family
    // state); the HDFS-backed default cannot run it
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val tws = drain("tws_new", EventStream.sessionizeTws(spark, streamIn))
      assert(tws.nonEmpty)
      assert(tws == classic)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
