package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Stats, TextAnalysis}

/** Streaming corpus statistics — the incremental face of the KMV distinct
  * sketch ([[graft.plans.KmvMinHashesAggregate]]).
  *
  * A windowed streaming aggregate carries the sketch's bounded k-min
  * buffer as its state row: per (event-time window, stratum) the state is
  * ≤ k longs REGARDLESS of how many tokens the window saw — the property
  * that makes a per-window distinct-vocabulary estimate viable on an
  * unbounded stream (an exact `approx_count_distinct`-class question with
  * a replayable exact-integer law instead of an opaque HLL register
  * image). Because the minima are a pure function of the window's input
  * SET, the streaming answer is bit-identical to the batch
  * [[Stats.kmvEstimate]] over the same rows — micro-batch boundaries,
  * retries and state round-trips cannot change it, and the spec asserts
  * exactly that.
  *
  * Append mode + watermark: each window emits once, when the watermark
  * passes its end; state for closed windows is evicted, so total state is
  * bounded by strata × windows-in-horizon × k longs. */
object StatsStream {

  /** The one law both faces share — explode to token hashes, window-group
    * the sketch, render the estimate. The stream ≡ batch parity contract
    * holds BECAUSE this body is shared: the two entry points differ only
    * in the watermark on the input. */
  private def estimateLaw(docs: DataFrame, tsCol: String,
      stratumCol: String, textCol: String, windowLen: String,
      k: Int): DataFrame =
    docs
      .select(col(tsCol).as("ts"), col(stratumCol).as("stratum"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("tok"))
      .select(col("ts"), col("stratum"),
        Dedup.sha63(col("tok"), lit(0)).as("h"))
      .groupBy(window(col("ts"), windowLen), col("stratum"))
      .agg(graft.functions.GraftFunctions.kmvMinHashes(col("h"), k)
        .as("mins"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("stratum"),
        Stats.kmvEstimate(col("mins"), k).as("distinct_est"))

  /** Per-(window, stratum) distinct-TOKEN estimate over a document stream.
    * Emits (window_start, window_end, stratum, distinct_est) in append
    * mode once the watermark passes the window end. */
  def windowedDistinctEstimate(docs: DataFrame, tsCol: String,
      stratumCol: String, textCol: String, windowLen: String,
      horizon: String, k: Int = 64): DataFrame =
    estimateLaw(docs.withWatermark(tsCol, horizon), tsCol, stratumCol,
      textCol, windowLen, k)

  /** The batch twin of [[windowedDistinctEstimate]] — the SAME law over a
    * static frame, for parity assertions and backfill. */
  def batchDistinctEstimate(docs: DataFrame, tsCol: String,
      stratumCol: String, textCol: String, windowLen: String,
      k: Int = 64): DataFrame =
    estimateLaw(docs, tsCol, stratumCol, textCol, windowLen, k)
}
