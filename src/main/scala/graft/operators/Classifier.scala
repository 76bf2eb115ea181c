package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** In-engine linear-classifier TRAINING over hashed token features — the
  * counterpart to [[TextAnalysis.qualityScoreLinear]], which only APPLIES
  * broadcast weights. A fastText-style quality/domain classifier is
  * trained in the curation pipeline itself (labels = a trusted stratum
  * vs. the crawl, the CCNet/DSIR recipe), then its weights feed the
  * scoring gate downstream.
  *
  * The learning rule is the BATCH perceptron (all-misclassified update
  * per round), not the sequential one: the sequential rule's output
  * depends on row visit order, which no distributed engine can pin
  * cheaply, while the batch rule is a pure dataset-level fixpoint —
  *
  *   w_0     = 0
  *   M_t     = { i : y_i · ⟨w_t, x_i⟩ ≤ 0 }          (margin test)
  *   w_{t+1} = w_t + Σ_{i ∈ M_t} y_i · x_i            (exact integers)
  *
  * with x_i the hashed term-frequency vector (the hashing trick,
  * Weinberger et al. 2009: bucket = sha256(token) mod dims — the
  * engine-replayable hash family every law in this repo keys on) and
  * y_i ∈ {+1, −1}. Every quantity is an exact integer, so a SQL engine
  * replays training round-for-round (the oracle unrolls the R rounds as
  * CTEs, like the BPE merge law) and the final weights hash-match.
  *
  * Scale shape (the part that must survive 100 TB):
  *   - feature extraction is ONE explode + ONE hash-agg to doc-grain
  *     (doc_id, bucket, tf) rows, checkpointed once and reused by every
  *     round — the corpus text is never re-read after this pass;
  *   - each round is a BROADCAST join of the weight vector (≤ dims rows,
  *     driver-bounded by construction) + one map-combinable agg to
  *     doc-grain margins + one map-combinable agg back to bucket-grain
  *     deltas (≤ dims rows). Nothing wide ever shuffles; rounds touch
  *     only narrow (long, long, long) rows.
  *   - the only driver-side materialization is the per-round weight
  *     vector itself (dims rows — same bounded-fetch license as the BPE
  *     trainer's 1-row arg-max and the IVF centroid collect).
  *
  * Overflow bound: |w[b]| ≤ R · Σ_i tf_ib ≤ R · total corpus tokens, and
  * |margin| ≤ max_doc_tokens · max_b |w[b]| — at R ≤ 8 rounds this fits
  * BIGINT until ~10^15 corpus tokens; the trainer `require`s dims ≤ 2^20
  * and rounds ≤ 64 to keep the license honest. */
object Classifier {

  /** Hashing-trick feature bucket: first 8 sha256 hex chars as a uniform
    * 32-bit int, mod dims (engine-replayable:
    * `('0x' || substr(sha256(w), 1, 8))::BIGINT % dims`). */
  def hashBucket(word: Column, dims: Int): Column =
    pmod(conv(substring(sha2(word, 256), 1, 8), 16, 10).cast("long"),
      lit(dims.toLong))

  /** Doc-grain hashed tf features: (doc_id, y, bucket, tf). Tokens are
    * lowercased whitespace tokens — the corpus-wide token law. */
  def docFeatures(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, dims: Int): DataFrame =
    df.select(col(idCol).as("doc_id"), col(labelCol).cast("long").as("y"),
        explode(transform(TextAnalysis.tokens(col(textCol)),
          w => lower(w))).as("w"))
      .select(col("doc_id"), col("y"), hashBucket(col("w"), dims).as("bucket"))
      .groupBy("doc_id", "y", "bucket").agg(count(lit(1)).as("tf"))

  /** Train `rounds` batch-perceptron rounds; returns (weights, feats):
    * weights = (bucket, w) with one row per bucket that any document
    * touches, feats = the checkpointed doc-grain feature frame (callers
    * score with it instead of re-reading text). Labels must be ±1. */
  def trainPerceptron(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, dims: Int, rounds: Int): (DataFrame, DataFrame) = {
    require(dims > 0 && dims <= (1 << 20), s"dims $dims out of range")
    require(rounds >= 1 && rounds <= 64, s"rounds $rounds out of range")
    val feats = docFeatures(df, idCol, textCol, labelCol, dims)
      .localCheckpoint(true) // reused every round + by the scorer
    // Round 1 closed-form: w_0 = 0 ⇒ every margin is 0 ⇒ every doc is in
    // M_0, so w_1 = Σ_i y_i·x_i without a margin pass.
    var w = feats.groupBy("bucket")
      .agg(sum(col("y") * col("tf")).as("w"))
      .localCheckpoint(true) // ≤ dims rows; truncates the per-round lineage
    for (_ <- 2 to rounds) {
      val margins = feats
        .join(broadcast(w), Seq("bucket"), "left")
        .groupBy("doc_id", "y")
        .agg(sum(col("tf") * coalesce(col("w"), lit(0L))).as("margin"))
      val mis = margins.where(col("y") * col("margin") <= 0)
        .select("doc_id")
      val delta = feats.join(mis, "doc_id")
        .groupBy("bucket").agg(sum(col("y") * col("tf")).as("delta"))
      // every bucket in delta already appears in w (w_1 covers every
      // bucket any doc touches), so a left join loses nothing
      w = w.join(delta, Seq("bucket"), "left")
        .select(col("bucket"),
          (col("w") + coalesce(col("delta"), lit(0L))).as("w"))
        .localCheckpoint(true)
    }
    (w, feats)
  }

  /** Score the checkpointed feature frame under trained weights:
    * (doc_id, y, margin, predicted, correct), predicted = +1 iff
    * margin > 0 (ties → −1, the M_t convention). */
  def scoreFeatures(feats: DataFrame, weights: DataFrame): DataFrame =
    feats.join(broadcast(weights), Seq("bucket"), "left")
      .groupBy("doc_id", "y")
      .agg(sum(col("tf") * coalesce(col("w"), lit(0L))).as("margin"))
      .withColumn("predicted",
        when(col("margin") > 0, 1L).otherwise(-1L))
      .withColumn("correct", col("predicted") === col("y"))
}
