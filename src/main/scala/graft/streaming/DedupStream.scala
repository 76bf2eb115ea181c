package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Streaming face of the exact-dedup pass: content-hash
  * `dropDuplicatesWithinWatermark`, the ingestion-time dedup a continuously
  * landing training corpus needs (batch dedup of an append-only corpus
  * re-shuffles the world every run; the stream dedups each doc once, on
  * arrival).
  *
  * Scale shape: state keeps ONE (hash → expiry) entry per distinct document
  * seen within the watermark horizon, partitioned by the shuffle on the
  * hash — and the watermark EVICTS entries past the horizon, so state is
  * bounded by rate × horizon, not corpus size. The horizon is the
  * dedup-visibility contract: a duplicate arriving later than `horizon`
  * after its twin is forwarded, exactly like the reference's per-batch
  * compactor whose dedup window is the batch (`ChangeCompaction` — cross-
  * batch dedup is the consumer's job there too). */
object DedupStream {

  /** sha-256 of the normalized text — same law as [[Dedup.exact]], so batch
    * and stream agree on what counts as a duplicate. */
  def contentHash(text: Column): Column = sha2(Dedup.normalized(text), 256)

  /** Drop duplicate documents within the watermark horizon. Input must be a
    * streaming frame with an event-time column `tsCol`. */
  def dedupExact(docs: DataFrame, textCol: String, tsCol: String,
      horizon: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash", contentHash(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")
}
