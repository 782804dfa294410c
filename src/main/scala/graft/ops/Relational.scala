package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational operator catalog — scans, filters, scalar functions,
  * aggregation, joins, windows, set ops (SURVEY.md §2.1–2.8).
  *
  * Every query is a `(SparkSession, sfDir) => DataFrame` over the driver
  * testdata, paired with ANSI SQL for the DuckDB oracle. Conventions for
  * hash-stable cross-engine comparison:
  *   - every query ends in a fully deterministic ORDER BY;
  *   - double aggregations go through DECIMAL(18,2/6) then back to DOUBLE so
  *     summation order can't change low bits;
  *   - rank/length/datediff/count are cast to BIGINT on the Spark side
  *     (DuckDB's native width);
  *   - timestamps are truncated to seconds or cast to DATE (testdata `ts` is
  *     ns-precision; Spark reads µs).
  *
  * Scale notes are in each query's doc: filters/projers push to the parquet
  * scan, small dims are broadcast, aggregations are partial (map-side)
  * automatically, and nothing collects to the driver.
  */
object Relational {

  /** Sum a double column exactly: fix digits per-row (deterministic per-row
    * double→decimal rounding), sum wide, return double. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  // S1/P1 — projection + pushed filter. The filter and the 4-col projection
  // must reach the parquet scan (PushedFilters / ReadSchema in explain).
  def q01ScanProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 45.0)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  val q01Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem WHERE l_quantity > 45.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // P2/P4/P9 — derived columns + CASE WHEN (reference v2:91-94) + conjunctive
  // filter. disc_price is a per-row product: bit-identical across engines.
  def q02FilterCase(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R" && col("l_quantity").between(10, 20))
      .withColumn("disc_price", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .withColumn("disc_band",
        when(col("l_discount") > 0.05, "HIGH").otherwise("LOW"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "disc_price", "disc_band")
      .orderBy("l_orderkey", "l_linenumber")

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |       l_extendedprice * (1.0 - l_discount) AS disc_price,
      |       CASE WHEN l_discount > 0.05 THEN 'HIGH' ELSE 'LOW' END AS disc_band
      |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity BETWEEN 10 AND 20
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // F1/F2/F4/F5/F6/F8 — regexp_extract, split+element_at, translate, length,
  // concat (reference v2:68-82,145; v2:76). All codegen'd builtins, no UDFs.
  // spread: regex/string work on a one-row-group file would run in 1 task,
  // twice (the ORDER BY's range-sampling pass re-executes the map pipeline)
  def q03StringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.spread(s, Tables.part(s, d), "p_partkey")
      .withColumn("type_head", regexp_extract(col("p_type"), "^(\\w+)", 1))
      .withColumn("name_first", element_at(split(col("p_name"), " "), 1))
      .withColumn("brand_flat", translate(col("p_brand"), "#", ""))
      .withColumn("name_len", length(col("p_name")).cast("long"))
      .withColumn("brand_type", concat(col("p_brand"), lit("/"), col("p_type")))
      .select("p_partkey", "type_head", "name_first", "brand_flat", "name_len", "brand_type")
      .orderBy("p_partkey")

  val q03Sql: String =
    """SELECT p_partkey,
      |       regexp_extract(p_type, '^(\w+)', 1) AS type_head,
      |       string_split(p_name, ' ')[1] AS name_first,
      |       translate(p_brand, '#', '') AS brand_flat,
      |       CAST(length(p_name) AS BIGINT) AS name_len,
      |       p_brand || '/' || p_type AS brand_type
      |FROM part ORDER BY p_partkey""".stripMargin

  // F3/F9/F10 — to-date cast, date_trunc, datediff, year extraction
  // (reference v2:80,144,174,182,287).
  def q04DateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.spread(s, Tables.orders(s, d), "o_orderkey")
      .withColumn("o_date", col("o_orderdate").cast("date"))
      .withColumn("o_month", date_trunc("month", col("o_orderdate")).cast("date"))
      .withColumn("o_year", year(col("o_orderdate")).cast("long"))
      .withColumn("days_since",
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).cast("long"))
      .select("o_orderkey", "o_date", "o_month", "o_year", "days_since")
      .orderBy("o_orderkey")

  val q04Sql: String =
    """SELECT o_orderkey,
      |       CAST(o_orderdate AS DATE) AS o_date,
      |       CAST(date_trunc('month', o_orderdate) AS DATE) AS o_month,
      |       CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // A2 — multi-key hash aggregation, TPC-H Q1 shape. Catalyst plans
  // partial+final HashAggregate (map-side combine) — the 100 TB-safe shape.
  // spread first: the single-row-group parquet file means the scan AND the
  // map-side partial aggregation (5 decimal sums × 600k rows) otherwise run
  // in one task (measured 2.7 s → ~0.9 s steady-state at sf0.1 on 32 cores;
  // the 5.5 s in BENCH_r01 was a transient-interference outlier — full-bench
  // reruns measure 0.9–1.4 s, and Bench now records best-of-2 passes). At
  // real scale inputs arrive pre-split and the repartition is a no-op.
  def q05AggGroup(s: SparkSession, d: String): DataFrame =
    Tables.spread(s, Tables.lineitem(s, d), "l_orderkey")
      .filter(col("l_shipdate").cast("date") <= lit("2001-06-01").cast("date"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)"))
          .cast("double").as("sum_disc_price"),
        (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q05Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |       COUNT(*) AS count_order
      |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '2001-06-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // A1 — MAX_BY grouped aggregate (reference v2:200-205). o_totalprice has no
  // per-customer ties in the testdata, so max_by is deterministic.
  def q06AggMaxBy(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(
        max_by(col("o_orderkey"), col("o_totalprice")).as("top_order"),
        max(col("o_totalprice")).as("top_price"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  val q06Sql: String =
    """SELECT o_custkey,
      |       max_by(o_orderkey, o_totalprice) AS top_order,
      |       max(o_totalprice) AS top_price,
      |       COUNT(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // A5 — SELECT DISTINCT (reference v2:182).
  def q07Distinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderstatus", "o_orderpriority")
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority")

  val q07Sql: String =
    """SELECT DISTINCT o_orderstatus, o_orderpriority
      |FROM orders ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  // J1/J2 — left equi-join chain over the star schema with broadcast dims
  // (reference v2:179-184,229-257). nation/region are tiny at any SF —
  // broadcast them so the only shuffle is the final aggregation.
  def q08JoinEqui(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("r_name", "n_name")

  val q08Sql: String =
    """SELECT r_name, n_name,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // left-anti join: parts never shipped in large quantity (NOT EXISTS).
  def q09JoinAnti(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .join(Tables.lineitem(s, d).filter(col("l_quantity") > 49.0),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select("p_partkey", "p_brand", "p_type")
      .orderBy("p_partkey")

  val q09Sql: String =
    """SELECT p_partkey, p_brand, p_type
      |FROM part WHERE NOT EXISTS (
      |  SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 49.0)
      |ORDER BY p_partkey""".stripMargin

  // left-semi join: parts that appear in some lineitem with qty > 49 (EXISTS).
  def q10JoinSemi(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .join(Tables.lineitem(s, d).filter(col("l_quantity") > 49.0),
        col("p_partkey") === col("l_partkey"), "left_semi")
      .select("p_partkey", "p_brand")
      .orderBy("p_partkey")

  val q10Sql: String =
    """SELECT p_partkey, p_brand
      |FROM part WHERE EXISTS (
      |  SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 49.0)
      |ORDER BY p_partkey""".stripMargin

  // W2/W4 — rank over partition + top-1 filter (reference v2:106,259-260,290).
  def q11WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
    Tables.orders(s, d)
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
      .orderBy("o_custkey", "o_orderkey")
  }

  val q11Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS BIGINT) AS rnk
      |  FROM orders)
      |WHERE rnk = 1 ORDER BY o_custkey, o_orderkey""".stripMargin

  // W3 — LAG over a global (unpartitioned) ordered window (reference
  // v2:196-198). Applied to a pre-aggregated monthly series so the
  // single-partition window sees only ~#months rows — the reference pattern
  // (global lag over per-election rows) at its true cardinality; never run a
  // global window over raw fact rows at scale.
  def q12WindowLag(s: SparkSession, d: String): DataFrame = {
    val monthly = Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(dsum(col("o_totalprice")).as("revenue"))
    val w = Window.orderBy("month")
    monthly
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("delta", col("revenue") - coalesce(col("prev_revenue"), lit(0.0)))
      .orderBy("month")
  }

  val q12Sql: String =
    """SELECT month, revenue,
      |       LAG(revenue, 1) OVER (ORDER BY month) AS prev_revenue,
      |       revenue - COALESCE(LAG(revenue, 1) OVER (ORDER BY month), 0.0) AS delta
      |FROM (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |  FROM orders GROUP BY 1)
      |ORDER BY month""".stripMargin

  // W1 — MAX_BY over an unordered partition window (reference v2:98-99):
  // dominant (highest-value) event type per user attached to every row.
  def q13WindowMaxBy(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    Tables.events(s, d)
      .withColumn("top_type", max_by(col("event_type"), col("value")).over(w))
      .withColumn("top_value", max(col("value")).over(w))
      .select("event_id", "user_id", "event_type", "top_type", "top_value")
      .orderBy("event_id")
  }

  val q13Sql: String =
    """SELECT event_id, user_id, event_type,
      |       max_by(event_type, value) OVER (PARTITION BY user_id) AS top_type,
      |       max(value) OVER (PARTITION BY user_id) AS top_value
      |FROM events ORDER BY event_id""".stripMargin

  // U1/U2 + set ops — UNION (dedup), then EXCEPT/INTERSECT branches
  // (reference v2:62-65,138-141; intersect/except are the free Spark surface).
  // NOT spread: measured no gain — the spread shuffle re-runs once per
  // set-op leg (three consumers, no cache), exactly offsetting the
  // parallelized partial aggregation; the set-op shuffles themselves
  // already distribute the heavy work
  def q14SetOps(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val a = li.filter(col("l_quantity") > 40.0).select("l_orderkey", "l_linenumber")
    val b = li.filter(col("l_discount") > 0.08).select("l_orderkey", "l_linenumber")
    val c = li.filter(col("l_returnflag") === "A").select("l_orderkey", "l_linenumber")
    a.unionByName(b).distinct()
      .except(c.intersect(a))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val q14Sql: String =
    """(SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity > 40.0
      | UNION
      | SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_discount > 0.08)
      |EXCEPT
      |(SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag = 'A'
      | INTERSECT
      | SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity > 40.0)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // J3 — keyed as-of/interval join + rank-1 dedup (reference v2:274-292):
  // each purchase event matched to the closest preceding view/click by the
  // same user within 1 hour. The equality key (user_id) makes this a hash
  // join with a range post-filter — scale-safe, unlike the reference's
  // keyless BETWEEN join which forces a nested loop.
  def q15AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("ts_s", expr("ts_ns div 1000000000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_s"))
    val views = ev.filter(col("event_type").isin("view", "click"))
      .select(col("event_id").as("prev_event_id"), col("user_id").as("v_user_id"),
        col("ts_s").as("prev_ts_s"))
    val joined = purchases.join(views,
      col("user_id") === col("v_user_id") &&
        (col("ts_s") - col("prev_ts_s")).between(0, 3600),
      "inner")
      .withColumn("gap_s", col("ts_s") - col("prev_ts_s"))
    val w = Window.partitionBy("event_id").orderBy(col("gap_s"), col("prev_event_id").desc)
    joined
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") === 1)
      .select("event_id", "user_id", "prev_event_id", "gap_s")
      .orderBy("event_id")
  }

  val q15Sql: String =
    """SELECT event_id, user_id, prev_event_id, gap_s FROM (
      |  SELECT p.event_id, p.user_id, v.prev_event_id, p.ts_s - v.prev_ts_s AS gap_s,
      |         RANK() OVER (PARTITION BY p.event_id
      |                      ORDER BY p.ts_s - v.prev_ts_s, v.prev_event_id DESC) AS rnk
      |  FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS ts_s
      |        FROM events WHERE event_type = 'purchase') p
      |  JOIN (SELECT event_id AS prev_event_id, user_id AS v_user_id,
      |               epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS prev_ts_s
      |        FROM events WHERE event_type IN ('view', 'click')) v
      |    ON p.user_id = v.v_user_id AND p.ts_s - v.prev_ts_s BETWEEN 0 AND 3600)
      |WHERE rnk = 1 ORDER BY event_id""".stripMargin

  // I3 — fill-down / forward-fill (reference jobs/ingest/elections.py:55-65):
  // last non-null over an ordered per-user frame.
  def q16FillDown(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("v", when(col("event_type") === "click", lit(null)).otherwise(col("value")))
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
      .select("event_id", "user_id", "v", "filled")
      .orderBy("event_id")
  }

  val q16Sql: String =
    """SELECT event_id, user_id, v,
      |       last_value(v IGNORE NULLS) OVER (
      |         PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      |FROM (
      |  SELECT event_id, user_id, ts,
      |         CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
      |  FROM events)
      |ORDER BY event_id""".stripMargin

  // global sort + limit (§2.8 engine surface; absent in reference but part of
  // the query surface). Spark plans TakeOrderedAndProject — no full sort.
  def q17SortLimit(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(50)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  val q17Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin

  /** Full outer join — completes the join-type surface (inner/left via q08,
    * semi q10, anti q09). The customer side is restricted to c_custkey ≥ 5
    * so all THREE row classes genuinely appear in the testdata: event users
    * 0–4 have no customer row (left-only), custkeys past the user-id range
    * have no events (right-only), the rest match. The coalesced key keeps
    * the output deterministic. */
  def q47FullOuter(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    val cust = Tables.customer(s, d)
      .filter(col("c_custkey") >= 5)
      .select(col("c_custkey"), col("c_acctbal"))
    ev.join(cust, col("user_id") === col("c_custkey"), "full_outer")
      .select(coalesce(col("user_id"), col("c_custkey")).as("id"),
        col("n_events"), col("c_acctbal"))
      .orderBy("id")
  }

  val q47Sql: String =
    """SELECT COALESCE(e.user_id, c.c_custkey) AS id, e.n_events, c.c_acctbal
      |FROM (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id) e
      |FULL OUTER JOIN (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey >= 5) c
      |  ON e.user_id = c.c_custkey
      |ORDER BY id""".stripMargin

  /** name → (query fn, oracle SQL). */
  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q01_scan_project", q01ScanProject _, Some(q01Sql)),
    ("q02_filter_case", q02FilterCase _, Some(q02Sql)),
    ("q03_string_funcs", q03StringFuncs _, Some(q03Sql)),
    ("q04_date_funcs", q04DateFuncs _, Some(q04Sql)),
    ("q05_agg_group", q05AggGroup _, Some(q05Sql)),
    ("q06_agg_maxby", q06AggMaxBy _, Some(q06Sql)),
    ("q07_distinct", q07Distinct _, Some(q07Sql)),
    ("q08_join_equi", q08JoinEqui _, Some(q08Sql)),
    ("q09_join_anti", q09JoinAnti _, Some(q09Sql)),
    ("q10_join_semi", q10JoinSemi _, Some(q10Sql)),
    ("q11_window_rank", q11WindowRank _, Some(q11Sql)),
    ("q12_window_lag", q12WindowLag _, Some(q12Sql)),
    ("q13_window_maxby", q13WindowMaxBy _, Some(q13Sql)),
    ("q14_set_ops", q14SetOps _, Some(q14Sql)),
    ("q15_asof_join", q15AsofJoin _, Some(q15Sql)),
    ("q16_fill_down", q16FillDown _, Some(q16Sql)),
    ("q17_sort_limit", q17SortLimit _, Some(q17Sql)),
    ("q47_full_outer", q47FullOuter _, Some(q47Sql)),
  )
}
