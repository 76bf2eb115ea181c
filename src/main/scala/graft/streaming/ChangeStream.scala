package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row
import graft.operators.ChangeCompaction

/** Structured-Streaming port of the unbounded change-export mode
  * (`/root/reference/cmd/export_ledger_entry_changes.go:26-89`): the reference
  * blocks on sequential ledger files and emits one compacted batch per 64
  * ledgers; here the landing directory is a streaming file source and each
  * micro-batch is compacted and appended to a `batch_id`-partitioned sink —
  * idempotent, exactly-once via the file-sink commit protocol.
  *
  * The blockchain's total order means no late data: event-time = `closed_at`
  * is monotone, so no watermark is required for the compaction itself. A
  * watermark is still set when windowed aggregations are requested, to bound
  * state.
  */
object ChangeStream {

  /** Open the landing dir as a stream. `maxFilesPerTrigger` plays the role of
    * the reference's `--batch-size`. */
  def readChanges(spark: SparkSession, landingDir: String, schemaSource: DataFrame,
      maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream
      .schema(schemaSource.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)

  /** Per-micro-batch compaction + partitioned append. Compaction-within-batch
    * matches the reference's ChangeCompactor semantics (last state per key per
    * batch); cross-batch dedup is the consumer's job there too. */
  def writeCompactedBatches(
      changes: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      orderCols: Seq[String],
      outDir: String,
      checkpointDir: String,
      batchSize: Int = 64): DataStreamWriter[Row] =
    changes.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ChangeCompaction
          .compactBatches(batch, keyCols, seqCol, orderCols, batchSize)
          .write.mode("append").partitionBy("batch_id").parquet(outDir)
      }

  /** Tumbling event-time aggregation over the change stream (5-minute windows
    * ≈ the 64-ledger checkpoint cadence). Works identically in batch mode. */
  def windowedCounts(changes: DataFrame, tsCol: String, window: String = "5 minutes"): DataFrame =
    changes
      .withWatermark(tsCol, window)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col("entry_type"))
      .agg(count(lit(1)).as("n_changes"))
}
