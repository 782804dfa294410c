package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-mitigation utilities for 100 TB-scale shuffles.
  *
  * AQE's skew-join splitting handles most cases at runtime; these helpers
  * cover the two shapes AQE cannot fix:
  *  - a grouped aggregation where one key dominates (`saltedAgg`: two-stage
  *    partial→final aggregation over an explicit salt, bounding any single
  *    task's share of a hot key to 1/salts);
  *  - a broadcast-infeasible join against a skewed key distribution
  *    (`saltedJoin`: salt the big side, replicate the small side per salt).
  */
object Skew {

  /** Two-stage salted aggregation: `sum(valueCol)` per `key`, with the hot
    * keys first combined per (key, salt) then re-combined per key. The salt
    * derives from a hash of the full row position via `rand`-free
    * `xxhash64(monotonic id)` is NOT used — determinism matters for tests —
    * instead the salt hashes `saltFrom` (any reasonably-distributed column). */
  def saltedSumAgg(df: DataFrame, key: Column, value: Column,
      saltFrom: Column, salts: Int): DataFrame =
    df.select(key.as("k"), value.as("v"),
        pmod(xxhash64(saltFrom), lit(salts)).as("salt"))
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("total"))

  /** Salted join for a skewed fact side against a non-broadcastable dim:
    * fact rows get a random-but-deterministic salt in [0, salts); the dim is
    * replicated `salts` times so every (key, salt) bucket finds its match.
    * Join output is identical to the unsalted equi-join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFrom: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt", pmod(xxhash64(saltFrom), lit(salts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<bigint>")))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Catalog query: salted sum over lineitem's 3-value `l_returnflag` — the
    * canonical hot-key shape (≲ #keys tasks would otherwise carry the whole
    * table). Values go through DECIMAL so the two-stage summation order
    * cannot change low bits; the oracle is the plain one-stage GROUP BY. */
  def q38SaltedAgg(s: SparkSession, d: String): DataFrame =
    saltedSumAgg(Tables.lineitem(s, d),
      col("l_returnflag"), col("l_quantity").cast("decimal(18,2)"),
      col("l_orderkey"), salts = 16)
      .select(col("k"), col("total").cast("double").as("total"))
      .orderBy("k")

  val q38Sql: String =
    """SELECT l_returnflag AS k,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM lineitem GROUP BY l_returnflag ORDER BY k""".stripMargin

  /** Catalog query: salted join of lineitem (fact, skew-prone orderkeys)
    * against orders projected to (key, priority) — a stand-in for the
    * broadcast-infeasible skewed-dim shape. The salt round-trip must be
    * invisible: the oracle is the PLAIN equi-join. */
  def q41SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val fact = Tables.spread(s, Tables.lineitem(s, d), "l_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_partkey"))
    val dim = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    saltedJoin(fact, dim, "l_orderkey", col("l_partkey"), salts = 8)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"), col("o_orderpriority"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val q41Sql: String =
    """SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
      |       l.l_quantity, o.o_orderpriority
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Multi-level aggregation in one pass: ROLLUP over (returnflag,
    * linestatus) — subtotals and grand total come from the same shuffle
    * instead of three jobs (SURVEY §2.5 notes the surface; Spark plans an
    * Expand + single hash aggregation). NULL ordering is pinned explicitly:
    * Spark sorts NULLS FIRST by default where DuckDB sorts them LAST. */
  // spread: the single-row-group scan would otherwise run the 3× Expand and
  // the partial aggregation in ONE task (see Tables.spread)
  def q40Rollup(s: SparkSession, d: String): DataFrame =
    Tables.spread(s, Tables.lineitem(s, d), "l_orderkey")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val q40Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       COUNT(*) AS n,
      |       GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Per-group top-k WITHOUT sorting the group: the window formulation
    * (q11's shape) sorts every partition in full and discards all but k
    * rows — at huge group sizes that full sort is the bottleneck. The
    * `graft_topk` TypedImperativeAggregate carries at most k pairs per
    * (group × partition) through the map-side combine (memory O(k), shuffle
    * O(groups·k), no group-body sort). Same answer as the window — the
    * oracle IS the window formulation. */
  def q51TopkAgg(s: SparkSession, d: String): DataFrame = {
    graft.functions.TopKAgg.register(s)
    Tables.spread(s, Tables.orders(s, d), "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(expr("graft_topk(o_totalprice, o_orderkey, 3)").as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("o_orderpriority"), (col("i") + 1).cast("long").as("rk"),
        col("t.id").as("o_orderkey"), col("t.score").as("o_totalprice"))
      .orderBy("o_orderpriority", "rk")
  }

  val q51Sql: String =
    """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |           ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
      |  FROM orders)
      |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin

  /** Statistics as DECIMAL moment sums: count/mean/variance/stddev/
    * correlation all derive from Σx, Σx², Σy, Σy², Σxy — the map-side-
    * combinable formulation (one partial+final hash agg, no second pass).
    * Built-in `stddev`/`corr` accumulate in floating point, so their low
    * bits depend on partition order and can never hash-match a second
    * engine; exact decimal moments folded to double in one fixed expression
    * are bit-identical everywhere. */
  def q52Moments(s: SparkSession, d: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(18,2)")
    val y = col("l_extendedprice").cast("decimal(18,2)")
    Tables.spread(s, Tables.lineitem(s, d), "l_orderkey")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum((x * x).cast("decimal(28,4)")).cast("double").as("sxx"),
        sum(y).cast("double").as("sy"),
        sum((y * y).cast("decimal(28,4)")).cast("double").as("syy"),
        sum((x * y).cast("decimal(28,4)")).cast("double").as("sxy"))
      .select(col("l_returnflag"), col("n"),
        round(col("sx") / col("n"), 6).as("mean_qty"),
        round((col("sxx") - col("sx") * col("sx") / col("n")) / col("n"), 6)
          .as("var_qty"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) /
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) *
            (col("syy") - col("sy") * col("sy") / col("n"))), 6).as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  val q52Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS syy,
      |         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |       round(sx / n, 6) AS mean_qty,
      |       round((sxx - sx * sx / n) / n, 6) AS var_qty,
      |       round((sxy - sx * sy / n) /
      |             sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS corr_qty_price
      |FROM m ORDER BY l_returnflag""".stripMargin

  /** q87: CUBE over (returnflag, linestatus) — all four grouping sets
    * (detail, each one-dim subtotal, grand total) from ONE shuffle, the
    * completion of q40's ROLLUP (which only produces the prefix sets).
    * Spark plans the same Expand + single partial+final hash aggregation:
    * at 100 TB a cube over low-cardinality dims costs one pass over the
    * fact table regardless of how many grouping sets it materializes —
    * versus 2ᵈ separate GROUP BY jobs re-reading the table. Values go
    * through DECIMAL so the summation order across the Expand replicas
    * cannot move low bits; NULL ordering pinned as in q40. */
  def q87Cube(s: SparkSession, d: String): DataFrame =
    Tables.spread(s, Tables.lineitem(s, d), "l_orderkey")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val q87Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       COUNT(*) AS n,
      |       GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q38_salted_agg", q38SaltedAgg _, Some(q38Sql)),
    ("q40_rollup", q40Rollup _, Some(q40Sql)),
    ("q41_salted_join", q41SaltedJoin _, Some(q41Sql)),
    ("q51_topk_agg", q51TopkAgg _, Some(q51Sql)),
    ("q52_moments", q52Moments _, Some(q52Sql)),
    ("q87_cube", q87Cube _, Some(q87Sql)),
  )
}
