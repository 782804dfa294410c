package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage/round materialization barriers for the staged pipelines (the
  * curation funnel) and the iterative RDD kernels (clusterPairs /
  * starCluster).
  *
  * Default is `localCheckpoint`: blocks live in executor storage, lineage
  * is truncated (the round-18 exponential-stringification fix), and the
  * cost is one in-memory write — right for local[32] and any
  * single-process deployment. The trade is durability: local checkpoint
  * blocks DIE WITH THEIR EXECUTOR, and because lineage was truncated they
  * are unrecoverable — on a real cluster an executor loss mid-funnel
  * kills the job instead of recomputing.
  *
  * Setting `spark.graft.checkpointDir` (session conf; or the
  * `SPARK_GRAFT_CHECKPOINT_DIR` env var for mains) switches every barrier
  * to a RELIABLE `checkpoint()` into that directory — an HDFS/object-store
  * path on a cluster — making each stage/round replayable from storage
  * that survives executor loss. Results are IDENTICAL either way
  * (OperatorSpec pins the funnel and the cluster kernel mode-for-mode);
  * only the failure mode and the write target change. */
object Materialize {

  /** The configured reliable-checkpoint dir, if any. */
  private[graft] def reliableDir(s: SparkSession): Option[String] =
    s.conf.getOption("spark.graft.checkpointDir")
      .orElse(sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR"))
      .filter(_.nonEmpty)

  private def ensureCheckpointDir(s: SparkSession, dir: String): Unit =
    // setCheckpointDir appends a per-context UUID subdir, so only seed it
    // when unset — repeated calls would scatter checkpoints pointlessly
    if (s.sparkContext.getCheckpointDir.isEmpty)
      s.sparkContext.setCheckpointDir(dir)

  /** Eager stage barrier for a DataFrame pipeline: local checkpoint by
    * default, reliable checkpoint when the dir is configured. */
  def stage(df: DataFrame): DataFrame = reliableDir(df.sparkSession) match {
    case Some(dir) =>
      ensureCheckpointDir(df.sparkSession, dir)
      df.checkpoint()
    case None => df.localCheckpoint()
  }

  /** Round barrier for an iterative RDD kernel. The caller persists the
    * RDD first (both checkpoint flavors read the persisted blocks instead
    * of recomputing) and calls this BEFORE the round's action, which then
    * triggers the (lazy) reliable checkpoint exactly like the local one. */
  def round[T](s: SparkSession, rdd: RDD[T]): RDD[T] = {
    reliableDir(s) match {
      case Some(dir) => ensureCheckpointDir(s, dir); rdd.checkpoint()
      case None => rdd.localCheckpoint()
    }
    rdd
  }
}
