package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Checkpoint POLICY for the repo's iterative operators (BPE merge
  * rounds, perceptron rounds, connected-component loops, reused event
  * frames, pipeline composition points).
  *
  * `localCheckpoint(eager = true)` truncates lineage by writing blocks
  * to EXECUTOR-LOCAL storage — the right default on `local[n]` (one JVM,
  * nothing to lose) but wrong on a real cluster: local blocks are
  * non-replicated and die with their executor, so a single lost executor
  * kills an hours-long iterative job. The fix is RELIABLE checkpointing
  * to a fault-tolerant filesystem (HDFS/object store), which Spark
  * enables via `SparkContext.setCheckpointDir`.
  *
  * Policy, one decision for all call sites: if a checkpoint dir is
  * configured — either already set on the context or supplied as the
  * `spark.checkpoint.dir` session conf — use RELIABLE
  * `Dataset.checkpoint(eager = true)` / `RDD.checkpoint()`; otherwise
  * fall back to the local variant. Data content is identical either way
  * (checkpointing materializes the same rows under the same
  * partitioning), so result hashes do not depend on the policy — only
  * failure recovery does. A 100 TB deployment sets
  * `spark.checkpoint.dir` (plus
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` for file
  * cleanup) and every iterative operator in the repo becomes
  * executor-loss safe with no code change. */
object Checkpoints {

  /** Session conf consulted when the context has no checkpoint dir yet.
    * (`SparkContext.setCheckpointDir` is driver-side state; surfacing it
    * as a conf lets spark-submit/session builders opt in declaratively.) */
  val DirConfKey = "spark.checkpoint.dir"

  /** True iff a reliable checkpoint dir is available, setting it on the
    * context from [[DirConfKey]] on first use. */
  private def reliable(spark: SparkSession): Boolean = {
    val sc = spark.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      spark.conf.getOption(DirConfKey).filter(_.nonEmpty)
        .foreach(sc.setCheckpointDir)
    sc.getCheckpointDir.isDefined
  }

  /** Eagerly checkpoint `df` under the policy above. Drop-in for
    * `df.localCheckpoint(true)` via `df.transform(Checkpoints.checkpointed)`. */
  def checkpointed(df: DataFrame): DataFrame =
    if (reliable(df.sparkSession)) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** RDD face (the CC loops rebase per-round frames on materialized
    * RDDs): persist at `level`, then mark for reliable or local
    * checkpointing. Reliable RDD checkpointing is LAZY — the caller's
    * next action over the RDD materializes the checkpoint copy (every
    * loop in this repo counts/aggregates the round's frame immediately,
    * so the mark is always honored within the round). */
  def checkpointedRdd[T](spark: SparkSession, rdd: RDD[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): RDD[T] =
    if (reliable(spark)) { val p = rdd.persist(level); p.checkpoint(); p }
    else rdd.persist(level).localCheckpoint()
}
