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
    val toks = transform(TextAnalysis.tokens(col(textCol)), w => lower(w))
    stream
      .withColumn("margin",
        aggregate(toks, lit(0L), (acc, w) =>
          acc + coalesce(try_element_at(m, Classifier.hashBucket(w, dims)),
            lit(0L))))
      .withColumn("predicted",
        when(col("margin") > 0, 1L).otherwise(-1L))
  }
}
