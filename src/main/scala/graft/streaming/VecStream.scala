package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Similarity

/** Streaming ANN index ingest — the continuous form of
  * [[graft.ops.Similarity.ivfPqAppend]] (the q70 incremental-ingest story
  * applied to the serving index): fresh embedding batches arrive as a file
  * stream and are coarse-assigned + PQ-encoded MAP-SIDE under the
  * PERSISTED index artifacts (coarse centroids + codebooks, each collapsed
  * to a one-row broadcast), emitting (vec_id, cell, codes) rows that
  * append to the serving cell+code table. No retraining, no state, no
  * shuffle: the whole transform is a stateless projection against two
  * static one-row frames, so it is streaming-legal under any trigger and
  * the per-micro-batch cost is proportional to the batch — never the
  * corpus or the index.
  *
  * At 100 TB this is the ingest half of the artifact serving loop:
  * `ivfPqIndex` trains once and persists; this stream keeps the code
  * table current between retrains (codebook drift is a periodic BATCH
  * retrain + re-encode, the standard IVF-PQ operating practice — a stream
  * must never mutate the quantizers mid-flight, or old and new codes stop
  * being comparable under one LUT).
  *
  * `DocStreamSpec`'s VecStream case pins streamed ≡ batch: draining the
  * stream produces exactly `ivfPqAppend`'s rows for the same batch.
  */
object VecStream {

  /** embeddings.parquet schema (TESTDATA.md; `label` optional). */
  val rawSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** File stream over a directory of embeddings.parquet batches. */
  def readVecs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(dir)

  /** Assign + encode a streaming batch under persisted artifacts —
    * delegates to the batch `ivfPqAppend` verbatim (same expressions, same
    * broadcasts), which is exactly why streamed ≡ batch holds: the only
    * stream-specific part is the source. `cents`/`books` should be the
    * parquet-persisted artifacts (reading them back per micro-batch is a
    * few KB; training lineage would retrain per micro-batch). */
  def indexAppend(freshVecs: DataFrame, cents: DataFrame, books: DataFrame): DataFrame =
    Similarity.ivfPqAppend(cents, books,
      freshVecs.select(col("vec_id"), col("embedding").cast("array<double>").as("e")))
}
