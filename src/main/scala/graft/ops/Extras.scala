package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Remaining SURVEY §2 surface: empty-relation seed (S3), local-collection
  * source (S4), temp-view + SQL-string surface (S5), rlike (F11), explicit
  * window frame control (§2.6 engine surface).
  */
object Extras {

  // S3 + U1: empty-relation seed unioned with real data — the reference's
  // accumulator pattern (v2:52-65). The empty seed must not change results.
  def q18UnionSeed(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_orderpriority", StringType)))
    val seed = s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    val slice = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    seed.unionByName(slice).orderBy("o_orderkey")
  }

  val q18Sql: String =
    """SELECT o_orderkey, o_orderpriority FROM orders
      |WHERE o_orderpriority = '1-URGENT' ORDER BY o_orderkey""".stripMargin

  // S4 + J1: local collection → DataFrame, broadcast-joined to a table (the
  // reference's elec_dates pattern, v2:166-184).
  def q19LocalJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tiers = Seq(
      ("BUILDING", "core"), ("AUTOMOBILE", "core"),
      ("MACHINERY", "industrial"), ("FURNITURE", "consumer"),
      ("HOUSEHOLD", "consumer")).toDF("segment", "tier")
    Tables.customer(s, d)
      .join(broadcast(tiers), col("c_mktsegment") === col("segment"), "left")
      .groupBy("tier")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"))
      .orderBy("tier")
  }

  val q19Sql: String =
    """SELECT tier, COUNT(*) AS n_customers,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer
      |LEFT JOIN (VALUES ('BUILDING','core'), ('AUTOMOBILE','core'),
      |                  ('MACHINERY','industrial'), ('FURNITURE','consumer'),
      |                  ('HOUSEHOLD','consumer')) AS t(segment, tier)
      |  ON c_mktsegment = segment
      |GROUP BY tier ORDER BY tier""".stripMargin

  // S5 + F11: temp-view registration + SQL-string surface + rlike — the
  // reference alternates DataFrame API and spark.sql over views throughout.
  def q31SqlSurface(s: SparkSession, d: String): DataFrame = {
    Tables.part(s, d).createOrReplaceTempView("graft_part")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem")
    s.sql(
      """SELECT p.p_partkey, p.p_type, COUNT(*) AS n_lines
        |FROM graft_part p
        |JOIN graft_lineitem l ON l.l_partkey = p.p_partkey
        |WHERE p.p_type RLIKE '^(ECONOMY|PROMO)' AND l.l_quantity >= 25.0
        |GROUP BY p.p_partkey, p.p_type
        |ORDER BY p.p_partkey""".stripMargin)
  }

  val q31Sql: String =
    """SELECT p.p_partkey, p.p_type, COUNT(*) AS n_lines
      |FROM part p
      |JOIN lineitem l ON l.l_partkey = p.p_partkey
      |WHERE regexp_matches(p.p_type, '^(ECONOMY|PROMO)') AND l.l_quantity >= 25.0
      |GROUP BY p.p_partkey, p.p_type
      |ORDER BY p.p_partkey""".stripMargin

  // explicit frame control: running + sliding aggregates over ROWS frames
  // (the engine surface the reference never sets explicitly, §2.6).
  def q32WindowFrame(s: SparkSession, d: String): DataFrame = {
    val byCust = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").cast("date"), col("o_orderkey"))
    val running = byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sliding = byCust.rowsBetween(-2, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(running).cast("double"))
      .withColumn("sliding_3_spend",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(sliding).cast("double"))
      .select("o_custkey", "o_orderkey", "running_spend", "sliding_3_spend")
      .orderBy("o_custkey", "o_orderkey")
  }

  val q32Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sliding_3_spend
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // nested data surface (the v1 ESPN shape, SURVEY §1: ArrayType/StructType
  // + path projection + explode): parse the JSON props column, build a
  // struct/array, explode it back — column pruning still reaches the scan.
  def q33NestedJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("packed", struct(col("event_type").as("t"),
        array(col("k"), col("k") * 2).as("ks")))
      .select(col("event_id"), col("packed.t").as("t"),
        posexplode(col("packed.ks")).as(Seq("pos", "kx")))
      .orderBy("event_id", "pos")

  val q33Sql: String =
    """SELECT event_id, event_type AS t,
      |       CAST(p.pos AS INTEGER) AS pos,
      |       ks[CAST(p.pos AS INTEGER) + 1] AS kx
      |FROM (
      |  SELECT event_id, event_type,
      |         [CAST(json_extract_string(props, '$.k') AS INTEGER),
      |          CAST(json_extract_string(props, '$.k') AS INTEGER) * 2] AS ks
      |  FROM events)
      |CROSS JOIN (SELECT unnest(range(0, 2)) AS pos) p
      |ORDER BY event_id, pos""".stripMargin

  /** VARIANT semi-structured surface (Spark 4 native): `parse_json` encodes
    * the props column ONCE into the binary variant format; typed extraction
    * (`variant_get`) then reads offsets — no per-access string re-parse,
    * unlike q33's `get_json_object` which re-tokenizes the JSON text for
    * every path. At 100 TB this is the difference between parsing the JSON
    * column once per row and once per (row × extracted field); variant also
    * shreds into parquet (Spark 4 writes typed subcolumns) so pushdown
    * reaches inside the semi-structured blob. Missing paths surface as
    * typed NULLs via `try_variant_get` — flagged here so the oracle pins
    * the absent-path contract, not just the happy path. */
  def q66Variant(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("v", expr("parse_json(props)"))
      .select(col("event_id"),
        // try_variant_get (not strict variant_get) keeps parity with the
        // null-tolerant oracle (json_extract_string + CAST): a row whose
        // props lacks k, or holds a non-numeric k, must yield NULL in BOTH
        // engines rather than throw on the Spark side only
        expr("try_variant_get(v, '$.k', 'bigint')").as("k"),
        expr("try_variant_get(v, '$.absent', 'bigint')").as("absent_k"))
      .withColumn("has_absent", col("absent_k").isNull.cast("long"))
      .select("event_id", "k", "has_absent")
      .orderBy("event_id")

  val q66Sql: String =
    """SELECT event_id,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |       CAST(CASE WHEN json_extract_string(props, '$.absent') IS NULL
      |                 THEN 1 ELSE 0 END AS BIGINT) AS has_absent
      |FROM events ORDER BY event_id""".stripMargin

  // distribution-rank window functions (ntile / percent_rank / cume_dist):
  // the quantile-bucketing surface analytics users reach for constantly.
  // Ties are broken by c_custkey so every rank function is deterministic;
  // percent_rank/cume_dist are exact small-integer ratios — bit-identical
  // across engines.
  def q44WindowStats(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"),
        col("c_acctbal"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cum_dist"))
      .orderBy("c_custkey")
  }

  val q44Sql: String =
    """SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey, c_acctbal,
      |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
      |  PERCENT_RANK() OVER w AS pct_rank,
      |  CUME_DIST() OVER w AS cum_dist
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // pivot (long → wide): per-user event counts, one column per event type.
  // The value list is EXPLICIT — Spark's values-less pivot runs a distinct
  // scan on the driver first, which at 100 TB is a full extra job (and an
  // unbounded column count); pinning the columns keeps pivot a single
  // partial+final aggregation.
  def q45Pivot(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wide = Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types.foldLeft(wide)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy("user_id")
  }

  val q45Sql: String =
    """SELECT user_id,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q18_union_seed", q18UnionSeed _, Some(q18Sql)),
    ("q19_local_join", q19LocalJoin _, Some(q19Sql)),
    ("q31_sql_surface", q31SqlSurface _, Some(q31Sql)),
    ("q32_window_frame", q32WindowFrame _, Some(q32Sql)),
    ("q33_nested_json", q33NestedJson _, Some(q33Sql)),
    ("q44_window_stats", q44WindowStats _, Some(q44Sql)),
    ("q45_pivot", q45Pivot _, Some(q45Sql)),
    ("q66_variant", q66Variant _, Some(q66Sql)),
  )
}
