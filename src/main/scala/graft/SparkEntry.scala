package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{AsOf, Corpus, Dedup, Extras, Relational, Retrieval, Similarity, Skew, TextOps}
import graft.multimodal.MultimodalOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator catalog (SURVEY.md §2): one named query per
  * implemented operator over the driver testdata; `oracleSql` holds the
  * DuckDB-equivalent ANSI SQL for the hash-compare correctness gate.
  */
object SparkEntry {

  private def modules: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Relational.catalog ++ Extras.catalog ++ TextOps.catalog ++ Dedup.catalog ++
      Similarity.catalog ++ MultimodalOps.catalog ++ Corpus.catalog ++
      Skew.catalog ++ AsOf.catalog ++ Retrieval.catalog ++
      graft.sources.Sinks.catalog

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * Star-schema join + window + as-of pattern in ONE plan: the keyed as-of
    * join (q15 machinery — each purchase matched to its closest preceding
    * view/click by the same user within 1 h, hash join + range post-filter +
    * rank-1) feeds a star-schema enrichment (events → customer → nation,
    * both dimensions broadcast), then a second window ranks each nation's
    * purchases by how tightly the as-of matched. Mirrors the reference's
    * full transform shape (join + window + as-of,
    * jobs/transform/nfl-elec-transform-v2.py:274-292) on the driver
    * testdata. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val asof = Relational.q15AsofJoin(spark, d)
    val cust = Tables.customer(spark, d).select(col("c_custkey"), col("c_nationkey"))
    val nation = Tables.nation(spark, d).select(col("n_nationkey"), col("n_name"))
    val w = Window.partitionBy("n_name").orderBy(col("gap_s"), col("event_id"))
    asof
      .join(broadcast(cust), col("user_id") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .withColumn("nation_rnk", rank().over(w))
      .filter(col("nation_rnk") <= 5)
      .select("n_name", "nation_rnk", "event_id", "user_id", "prev_event_id", "gap_s")
      .orderBy("n_name", "nation_rnk", "event_id")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
