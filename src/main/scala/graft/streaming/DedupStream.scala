package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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

  // ---- streaming NEAR-dup (MinHash + LSH over keyed state) -----------------

  /** One banded row entering a bucket's state group. */
  case class BandRow(band_hash: Long, doc_id: Long,
      ts: java.sql.Timestamp, sig: Seq[Long])

  /** Per-bucket state: the bucket's FIRST document (the canonical owner)
    * and its full MinHash signature, so later arrivals verify against the
    * owner WITHOUT a join — the signature-agreement fraction is the
    * standard MinHash Jaccard estimate. */
  case class BucketState(owner_id: Long, owner_ts: java.sql.Timestamp,
      sig: Seq[Long])

  /** One band-level candidate: `owner_id` is None when this doc opened the
    * bucket; `sig_agree` counts matching signature components out of
    * `sig_len` (Jaccard estimate = sig_agree / sig_len). */
  case class BandCandidate(doc_id: Long, ts: java.sql.Timestamp,
      owner_id: Option[Long], sig_agree: Int, sig_len: Int)

  /** Streaming near-dup candidates: the ingestion-time face of
    * [[Dedup.minHashLsh]] — same shingle→MinHash→banded-bucket laws, but
    * each arriving document is checked ONCE, on arrival, against keyed
    * per-bucket state instead of re-shuffling the corpus every run.
    *
    * Scale shape: state keeps ONE (owner id, 16-long signature) entry per
    * distinct band bucket seen within the watermark horizon, partitioned by
    * the shuffle on `band_hash`; event-time timeout EVICTS buckets past the
    * horizon, so state is bounded by rate × horizon × bands, not corpus
    * size. Verification is signature-agreement (the MinHash estimate) read
    * straight from state — no candidate join, no second pass over text.
    * Emits `bands` rows per doc; resolve per-doc with [[resolveNearDups]]
    * (e.g. in `foreachBatch`, the repo's sessionize→pack idiom). */
  def nearDupCandidates(docs: DataFrame, textCol: String, idCol: String,
      tsCol: String, horizon: String = "10 minutes", shingleSize: Int = 3,
      bands: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val numHashes = bands * rowsPerBand
    val banded = docs
      .withWatermark(tsCol, horizon)
      .select(col(idCol).cast("long").as("doc_id"),
        col(tsCol).as("ts"),
        Dedup.minHashSignature(col(textCol), shingleSize, numHashes).as("sig"))
      .select(col("doc_id"), col("ts"), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col("sig"), b * lit(rowsPerBand) + 1, lit(rowsPerBand))), b)))
          .as("band_hash"))
      .as[BandRow]

    banded
      .groupByKey(_.band_hash)
      .flatMapGroupsWithState[BucketState, BandCandidate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // deterministic within-batch order: event time, then id
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            val out = Seq.newBuilder[BandCandidate]
            var cur = state.getOption
            sorted.foreach { r =>
              cur match {
                case None =>
                  cur = Some(BucketState(r.doc_id, r.ts, r.sig))
                  out += BandCandidate(r.doc_id, r.ts, None, 0, r.sig.size)
                case Some(st) if st.owner_id == r.doc_id => // same doc re-keyed
                case Some(st) =>
                  val agree = st.sig.iterator.zip(r.sig.iterator)
                    .count { case (a, b) => a == b }
                  out += BandCandidate(r.doc_id, r.ts, Some(st.owner_id),
                    agree, r.sig.size)
              }
            }
            cur.foreach { st =>
              state.update(st)
              // evict once the watermark passes owner ts + horizon
              state.setTimeoutTimestamp(st.owner_ts.getTime + 1, horizon)
            }
            out.result().iterator
          }
      }
      .toDF()
  }

  /** Per-document resolution of [[nearDupCandidates]] output (run per
    * micro-batch): a doc is a near-duplicate when its BEST band owner's
    * signature-agreement estimate reaches `threshold`; `dup_of` is that
    * owner. Keeps exactly the docs the batch pass would keep. */
  def resolveNearDups(candidates: DataFrame,
      threshold: Double = 0.7): DataFrame =
    candidates
      .groupBy("doc_id")
      .agg(
        max_by(col("owner_id"),
          when(col("owner_id").isNotNull,
            col("sig_agree").cast("double") / col("sig_len"))).as("dup_of"),
        coalesce(max(when(col("owner_id").isNotNull,
          col("sig_agree").cast("double") / col("sig_len"))), lit(0.0))
          .as("est_jaccard"))
      .withColumn("is_dup", col("est_jaccard") >= threshold)
      .withColumn("dup_of", when(col("is_dup"), col("dup_of")))
}
