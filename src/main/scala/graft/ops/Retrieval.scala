package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The hybrid-retrieval family: the serving patterns a RAG / eval-harness
  * stack runs against a trained corpus — lexical BM25 (q95), exact/ANN
  * vector search (q28/q74/q110), and here their composition: reciprocal-
  * rank fusion (q111), conjunctive keyword search (q112), and the lexical
  * index served from a persisted artifact (q113).
  *
  * Reference scope: the reference engine's query surface is relational
  * (jobs/transform/nfl-elec-transform-v2.py); this family is part of the
  * beyond-reference training-data/serving catalog (builder brief), built
  * from the SAME audited arms — q95's tokenization/index CTEs and q28's
  * ranked-cosine discipline — so the fusion adds no new float ops at all.
  */
object Retrieval {

  /** RRF constant (Cormack et al.'s k=60) and the fixed-point scale: each
    * arm contributes floor(10⁹/(60+rank)) — an exact integer both engines
    * compute from the same IEEE double division, so the fused score is a
    * BIGINT sum of two BIGINTs (order-independent, hash-stable). */
  private val RrfK = 60
  private val RrfScale = 1000000000.0
  private val FusedK = 10
  private[graft] val SemK = 10

  /** q111: HYBRID RETRIEVAL via reciprocal-rank fusion — the standard
    * two-arm RAG serving pattern: a lexical arm (q95's BM25 top-10 ranked
    * list) and a semantic arm (q28's brute cosine top-10, vec i ≡ doc i in
    * the testdata entity space) fused per (query, doc) by
    * Σ_arms floor(10⁹/(60+rank)), absent arms contributing 0.
    *
    * Hashability: ranks are the only inputs — both arms' tie-breaks are
    * already oracle-certified (q95/q28) — and the fused score is integer
    * arithmetic end-to-end; the one division is a correctly-rounded IEEE
    * double op identical in both engines, floored before the 2-term sum.
    *
    * Scale shape: each arm is its own audited serving plan (BM25: map-side
    * tf, broadcast query terms, partial+final score agg; cosine: the exact
    * arm — or any ANN arm by substitution since only ranks cross the
    * interface). The fusion itself joins two (n_queries·k)-row lists —
    * eval-set-sized, never corpus-sized — full-outer on (query_id, doc_id)
    * so a doc found by one arm only still fuses. */
  def q111HybridRrf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = TextOps.bm25Parts(s, d)
    val lex = TextOps.bm25RankedFrom(p.tf, p.df, p.stats, p.qt)
      .select(col("query_id"), col("doc_id"), col("rnk").as("lex_rnk"))
    val sem = Similarity.cosRanked(s, d, TextOps.Bm25NQueries, SemK)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rn").as("sem_rnk"))
    def arm(c: String) = coalesce(
      floor(lit(RrfScale) / (lit(RrfK) + col(c))).cast("long"), lit(0L))
    val w = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
    lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", arm("lex_rnk") + arm("sem_rnk"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= FusedK)
      .select("query_id", "rnk", "doc_id", "rrf", "lex_rnk", "sem_rnk")
      .orderBy("query_id", "rnk")
  }

  val q111Sql: String =
    s"""${TextOps.bm25RankCtes},
       |sem AS (
       |  ${Similarity.cosRankedSqlBody(TextOps.Bm25NQueries, SemK)}),
       |lexk AS (
       |  SELECT query_id, doc_id, rnk AS lex_rnk FROM lexr WHERE rnk <= ${TextOps.Bm25K}),
       |semk AS (
       |  SELECT query_id, neighbor_id AS doc_id, rn AS sem_rnk FROM sem),
       |fus AS (
       |  SELECT query_id, doc_id,
       |         COALESCE(CAST(floor($RrfScale / ($RrfK + lex_rnk)) AS BIGINT), 0)
       |       + COALESCE(CAST(floor($RrfScale / ($RrfK + sem_rnk)) AS BIGINT), 0) AS rrf,
       |         lex_rnk, sem_rnk
       |  FROM lexk FULL JOIN semk USING (query_id, doc_id))
       |SELECT query_id, rnk, doc_id, rrf, lex_rnk, sem_rnk FROM (
       |  SELECT query_id, doc_id, rrf, lex_rnk, sem_rnk,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |              ORDER BY rrf DESC, doc_id) AS BIGINT) AS rnk
       |  FROM fus)
       |WHERE rnk <= $FusedK ORDER BY query_id, rnk""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q111_hybrid_rrf", q111HybridRrf _, Some(q111Sql)),
  )
}
