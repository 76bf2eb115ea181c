package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import graft.operators.{Sessionize, TextAnalysis}

/** The incremental training-data path, composed end-to-end: raw events →
  * gap sessionization → fixed-token-budget sequence packing, running under
  * Structured Streaming.
  *
  * Shape: sessionization is the streaming-native `session_window` hash
  * aggregate ([[Sessionize]]) — state per open session, evicted at the
  * watermark; append mode emits each session exactly once, when the
  * watermark passes its close. Packing then runs per MICRO-BATCH via
  * `foreachBatch` over the cohort of just-finalized sessions — the same
  * one-shuffle window law as batch [[TextAnalysis.packSequences]], so each
  * emitted cohort is a ready training shard. The packing domain is the
  * cohort (pack ids carry `cohort_id`): a continuously-landing corpus
  * packs what has finalized, it does not re-pack the past — the streaming
  * analog of the batch law's per-shard independence. */
object TrainingStream {

  /** Incremental sessionization: watermarked `session_window` aggregate.
    * Emits (user, n_events, session_start_us, session_end_us) in append
    * mode once the watermark passes session end + gap. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      gap: String, horizon: String): DataFrame =
    Sessionize.sessions(
      events.withWatermark(tsCol, horizon), userCol, col(tsCol), gap)

  /** Stable sequence id shared by the batch and streaming paths: a hash of
    * (user, exact session start) — re-derivable from the session row alone,
    * so retries and replays assign identical ids. */
  def sessionSeqId(userCol: String): Column =
    xxhash64(col(userCol), col("session_start_us"))

  /** Pack one cohort of finalized sessions into token-budget packs
    * (tokens = session event count): the SAME law in batch and stream. */
  def packCohort(sessions: DataFrame, userCol: String, budget: Long,
      shards: Int): DataFrame = {
    val withId = sessions.withColumn("seq_id", sessionSeqId(userCol))
    TextAnalysis.packSequences(
        withId.select(col("seq_id"), col("n_events").cast("long").as("n_tok")),
        "seq_id", "n_tok", budget, shards)
      .select(col("seq_id"), col("shard"), col("pack_id"))
      .join(withId, "seq_id")
  }

  /** events → sessionize → pack per finalized cohort → parquet shards.
    * One output dir accumulates `cohort_id`-stamped packed sessions.
    *
    * Idempotence: `foreachBatch` is at-least-once, so a micro-batch retried
    * after a partial write must not duplicate rows. Each cohort lands in
    * its own `cohort_id=<batchId>` partition via dynamic partition
    * overwrite — a retry rewrites exactly its own partition and leaves
    * every other cohort untouched, making the emitted set identical to an
    * exactly-once run. */
  def sessionPacking(events: DataFrame, userCol: String, tsCol: String,
      gap: String, horizon: String, budget: Long, shards: Int,
      outDir: String, checkpointDir: String): DataStreamWriter[Row] =
    sessionize(events, userCol, tsCol, gap, horizon).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          packCohort(batch, userCol, budget, shards)
            .withColumn("cohort_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cohort_id")
            .parquet(outDir)
        }
      }
}
