package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{AsOf, Corpus, Dedup, Extras, Relational, Similarity, Skew, TextOps}
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
      Skew.catalog ++ AsOf.catalog

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-schema join + window + as-of pattern in one plan. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q08JoinEqui(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
