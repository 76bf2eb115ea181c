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

  /** One held owner: a document this bucket saw within the horizon, with
    * its full MinHash signature so arrivals verify against it WITHOUT a
    * join. */
  case class BucketOwner(owner_id: Long, owner_ts: java.sql.Timestamp,
      sig: Seq[Long])

  /** Per-bucket state: the last `ownerCap` documents that entered the
    * bucket, oldest first. A capped LIST (not the single first-owner) so a
    * B/C near-dup pair is still visible in a bucket an unrelated A opened
    * first — the single-owner variant missed every pair whose shared
    * buckets were all owned by third documents. */
  case class BucketState(owners: Seq[BucketOwner])

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
    * Scale shape: state keeps at most `ownerCap` (owner id, 16-long
    * signature) entries per distinct band bucket seen within the watermark
    * horizon, partitioned by the shuffle on `band_hash`; event-time timeout
    * plus per-batch aging EVICT owners past the horizon, so state is
    * bounded by rate × horizon × bands × ownerCap, not corpus size.
    * Verification is signature-agreement (the MinHash estimate) against
    * EVERY held owner — no candidate join, no second pass over text.
    *
    * Recall bound vs the batch pass: [[Dedup.minHashLsh]] sees every
    * co-bucketed pair; the stream sees a pair (A, B) iff A is still among
    * the bucket's `ownerCap` newest entries when B arrives — a pair is
    * missed only when ≥ ownerCap other documents entered EVERY bucket the
    * pair shares between the two arrivals (oldest-first eviction), or when
    * B arrives more than `horizon` after A (the documented dedup-visibility
    * contract, same as exact dedup). Emits up to `bands × ownerCap` rows
    * per doc; resolve per-doc with [[resolveNearDups]] (e.g. in
    * `foreachBatch`, the repo's sessionize→pack idiom). */
  def nearDupCandidates(docs: DataFrame, textCol: String, idCol: String,
      tsCol: String, horizon: String = "10 minutes", shingleSize: Int = 3,
      bands: Int = 8, rowsPerBand: Int = 2, ownerCap: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val numHashes = bands * rowsPerBand
    val horizonMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .getDuration(
        org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
          org.apache.spark.unsafe.types.UTF8String.fromString(horizon)),
        java.util.concurrent.TimeUnit.MILLISECONDS)
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
          if (state.hasTimedOut) {
            // fires once the watermark passes newest-owner ts + horizon ⇒
            // every held owner has aged out
            state.remove(); Iterator.empty
          } else {
            val watermark = state.getCurrentWatermarkMs()
            // deterministic within-batch order: event time, then id
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            val out = Seq.newBuilder[BandCandidate]
            // age out owners the batch-dedup contract no longer matches
            // (arrivals > horizon after them are forwarded anyway)
            var owners = state.getOption.map(_.owners).getOrElse(Seq.empty)
              .filter(_.owner_ts.getTime + horizonMs > watermark)
            sorted.foreach { r =>
              if (!owners.exists(_.owner_id == r.doc_id)) { // re-keyed self
                if (owners.isEmpty)
                  out += BandCandidate(r.doc_id, r.ts, None, 0, r.sig.size)
                else owners.foreach { o =>
                  val agree = o.sig.iterator.zip(r.sig.iterator)
                    .count { case (a, b) => a == b }
                  out += BandCandidate(r.doc_id, r.ts, Some(o.owner_id),
                    agree, r.sig.size)
                }
                // append as an owner; oldest-first eviction at the cap
                owners = (owners :+ BucketOwner(r.doc_id, r.ts, r.sig))
                  .takeRight(ownerCap)
              }
            }
            if (owners.nonEmpty) {
              state.update(BucketState(owners))
              // evict once the watermark passes the newest owner + horizon;
              // clamp the base above the current watermark — re-arming from
              // a stale owner ts below the watermark throws in Spark ≥3.x
              // ("Timeout timestamp cannot be earlier than watermark") and
              // would wedge the stream on restart replay
              state.setTimeoutTimestamp(
                math.max(owners.map(_.owner_ts.getTime).max + 1,
                  watermark + 1), horizon)
            } else if (state.exists) state.remove()
            out.result().iterator
          }
      }
      .toDF()
  }

  // ---- streaming SEMANTIC dedup (embedding cells over keyed state) ---------

  /** One quantized document entering a cell's state group. */
  case class CellDoc(cell: Long, doc_id: Long, ts: java.sql.Timestamp,
      qv: Seq[Long], n2: Long)

  /** One held cell owner: id, event time, quantized vector + Σv². */
  case class CellOwner(owner_id: Long, owner_ts: java.sql.Timestamp,
      qv: Seq[Long], n2: Long)

  case class CellState(owners: Seq[CellOwner])

  /** Per-document verdict: `dup_of` = the lowest in-horizon co-cell owner
    * whose exact integer cosine clears the threshold, None otherwise. */
  case class SemCandidate(doc_id: Long, ts: java.sql.Timestamp,
      dup_of: Option[Long])

  /** Streaming face of [[Dedup.semanticDedup]] (SemDeDup): each arriving
    * embedding routes to its centroid cell (the same exact integer-L2
    * argmin law, against OFFLINE-TRAINED centroid constants — a stream
    * cannot derive its own "lowest-id" seed, so the deployment trains the
    * cells on a bootstrap corpus via
    * [[graft.operators.Similarity.buildIvfIndexExact]] /
    * [[graft.operators.Similarity.refineIvfCentroidsExact]] and ships them
    * here) and is verified ONCE, on arrival, against the cell's held
    * owners with the batch operator's exact integer cosine law
    * (dot²·cosDen ≥ n2a·n2b·cosNum, BigInt-exact). One output row per doc.
    *
    * State/recall contract mirrors [[nearDupCandidates]]: at most
    * `ownerCap` owners per cell (oldest-first eviction), per-batch owner
    * aging plus a watermark-clamped event-time timeout bound state by
    * rate × horizon × cells × ownerCap; a dup pair is missed only when
    * ≥ ownerCap docs entered the cell between the pair's arrivals, when
    * the pair straddles a cell boundary (the batch operator's own
    * cluster-split miss), or past the horizon. */
  def semanticDupCandidates(docs: DataFrame, vecCol: String, idCol: String,
      tsCol: String, centroids: Seq[(Long, Seq[Long])],
      cosNum: Int = 4, cosDen: Int = 25, horizon: String = "10 minutes",
      ownerCap: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(centroids.nonEmpty, "semantic dedup stream needs centroids")
    val horizonMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .getDuration(
        org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
          org.apache.spark.unsafe.types.UTF8String.fromString(horizon)),
        java.util.concurrent.TimeUnit.MILLISECONDS)
    val centFlat = centroids.flatMap(_._2).toArray
    val quant = transform(col(vecCol),
      x => round(x.cast("double") * 10000).cast("long"))
    val routed = docs
      .withWatermark(tsCol, horizon)
      .select(col(idCol).cast("long").as("doc_id"), col(tsCol).as("ts"),
        quant.as("qv"))
      .withColumn("n2", graft.functions.GraftFunctions.longNorm2(col("qv")))
      .withColumn("cell", graft.functions.GraftFunctions.longL2Argmin(
        col("qv"), centFlat, centroids.size))
      .as[CellDoc]

    def qualifies(o: CellOwner, n2: Long, dot: Long): Boolean =
      dot > 0 && BigInt(dot) * dot * cosDen >= BigInt(o.n2) * n2 * cosNum

    routed
      .groupByKey(_.cell)
      .flatMapGroupsWithState[CellState, SemCandidate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[CellState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val watermark = state.getCurrentWatermarkMs()
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            val out = Seq.newBuilder[SemCandidate]
            var owners = state.getOption.map(_.owners).getOrElse(Seq.empty)
              .filter(_.owner_ts.getTime + horizonMs > watermark)
            sorted.foreach { r =>
              if (!owners.exists(_.owner_id == r.doc_id)) {
                val dupOf = owners.iterator.filter { o =>
                  val dot = o.qv.iterator.zip(r.qv.iterator)
                    .map { case (a, b) => a * b }.sum
                  qualifies(o, r.n2, dot)
                }.map(_.owner_id).reduceOption(_ min _)
                out += SemCandidate(r.doc_id, r.ts, dupOf)
                owners = (owners :+ CellOwner(r.doc_id, r.ts, r.qv, r.n2))
                  .takeRight(ownerCap)
              }
            }
            if (owners.nonEmpty) {
              state.update(CellState(owners))
              state.setTimeoutTimestamp(
                math.max(owners.map(_.owner_ts.getTime).max + 1,
                  watermark + 1), horizon)
            } else if (state.exists) state.remove()
            out.result().iterator
          }
      }
      .toDF()
      .withColumn("is_dup", col("dup_of").isNotNull)
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

  // ---- streaming near-dup against the PERSISTED corpus index --------------

  /** Ingestion-time near-dup detection against the historical corpus — a
    * STREAM-STATIC composition over [[graft.operators.Dedup.writeMinHashIndex]]:
    * each arriving doc's band keys (the same engine-replayable sha63 law
    * the index was written with) equi-join the bucketed index table, and
    * collisions verify with the exact shingle Jaccard against the static
    * corpus text (pruned to candidate ids by the join itself).
    *
    * Scale shape — ZERO STATE: unlike [[nearDupCandidates]] (keyed state
    * holding the in-horizon owners), a stream-static join is stateless, so
    * this gate has no watermark, no eviction, no state-store growth — the
    * historical corpus lives in the bucketed index (no index-side
    * exchange), and each micro-batch pays cost ∝ its own size. The two
    * faces compose: this gate catches dups against EVERYTHING indexed;
    * the keyed-state face catches dups WITHIN the live horizon; and
    * [[graft.operators.Dedup.appendMinHashIndex]] graduates kept docs into
    * the index between the two.
    *
    * Emits one row per (doc, indexed ref, shared band) that clears
    * `threshold` — append-mode friendly; consumers dedupe pair repeats at
    * the sink (a per-batch `dropDuplicates` in foreachBatch), since a
    * stateless stream cannot distinct. Self-pairs (a re-crawled id) are
    * excluded, matching the batch law. */
  def nearDupAgainstIndex(docs: DataFrame, textCol: String, idCol: String,
      indexTable: String, corpusDocs: DataFrame,
      shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    val sh = Dedup.shingles(col(textCol), shingleSize)
    // the stream side carries its shingle array through the join (micro-
    // batches are small; the static sides never shuffle). The signature
    // and band-key laws are Dedup's SHARED columns — the index writer and
    // this probe cannot drift apart (drifted keys would silently stop
    // colliding instead of erroring).
    val banded = docs
      .select(col(idCol).cast("long").as("doc_id"), sh.as("sh_b"),
        Dedup.minHashSigCol(sh, bands * rowsPerBand).as("sig"))
      .select(col("doc_id"), col("sh_b"),
        explode(Dedup.bandKeysCol(col("sig"), bands, rowsPerBand)).as("bk"))
    val idx = spark.table(indexTable).withColumnRenamed("doc_id", "dup_of")
    // join corpus RAW text first, shingle AFTER the join: candidates prune
    // the shingling, so the per-batch verify cost is ∝ collisions, never
    // an O(corpus) shingle pass per micro-batch (the corpus scan itself
    // stays columnar and text-pruned)
    val refText = corpusDocs
      .select(col(idCol).cast("long").as("dup_of"), col(textCol).as("__rt"))
    banded.join(idx, "bk")
      .where(col("doc_id") =!= col("dup_of"))
      .join(refText, "dup_of")
      .withColumn("sh_r", Dedup.shingles(col("__rt"), shingleSize))
      .withColumn("inter", size(array_intersect(col("sh_b"), col("sh_r"))))
      .withColumn("uni", size(col("sh_b")) + size(col("sh_r")) - col("inter"))
      .withColumn("jaccard",
        when(col("uni") === 0, lit(1.0)).otherwise(col("inter") / col("uni")))
      .where(col("jaccard") >= threshold)
      .select("doc_id", "dup_of", "jaccard")
  }
}
