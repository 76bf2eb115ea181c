package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.GraftFunctions

/** Dev probe for the PQ Lloyd-refinement laws: recall@5 and total
  * quantization distortion (Σ ADC(v, own code)) per iteration count on the
  * real sf0.001 embeddings, plus the adversarial-seed recovery corpus the
  * OperatorSpec pins (8 lowest ids one tight clump → seed codebooks
  * collapse; Lloyd must spread them back to the cluster structure). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val quant = transform(col("embedding"),
      x => round(x.cast("double") * 10000).cast("long"))
    for (it <- Seq(0, 1, 2, 3, 5)) {
      val idx = Similarity.buildPqIndexExact(emb, "vec_id", "embedding",
        m = 8, codewords = 16, lloydIters = it)
      val cbFlat = idx.codebooks.flatMap(_.flatten).toArray
      val cw = idx.codebooks.head.size
      val dist = emb.select(GraftFunctions.pqAdcDist(
          GraftFunctions.pqEncode(quant, cbFlat, 8, cw),
          GraftFunctions.pqLut(quant, cbFlat, 8, cw)).as("d"))
        .agg(sum("d")).head().getLong(0)
      val pq = Similarity.searchPqIndexExact(idx, queries, "qid", "qvec", k = 5)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val hits = exact.count { case (q, n) =>
        pq.getOrElse(q, Set.empty).contains(n) }
      println(s"[probe] real: lloydIters=$it recall@5=$hits/${exact.size} " +
        s"distortion=$dist")
    }

    // adversarial seed: 8 lowest ids are one tight clump, real structure is
    // 8 well-separated clusters of 10
    def center(c: Int): Array[Float] =
      Array.tabulate(16)(d => if (d == c * 2) 1.0f else 0.0f)
    def jitter(v: Array[Float], j: Int): Array[Float] =
      v.zipWithIndex.map { case (x, d) =>
        x + ((j * 7 + d * 3) % 5) * 0.002f }
    val clump = (0L to 7L).map(i => (i, jitter(center(0), i.toInt + 60)))
    val clusters = for (c <- 0 until 8; j <- 0 until 10)
      yield (100L + c * 10 + j, jitter(center(c), j))
    val adv = (clump ++ clusters).toDF("vec_id", "embedding")
    val aq = clusters.filter(_._1 % 10 == 5).map(t => (t._1, t._2))
      .toDF("qid", "qvec")
    val aExact = Similarity.bruteForceTopK(adv, "vec_id", "embedding",
        aq, "qid", "qvec", k = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (it <- Seq(0, 1, 2, 3, 5)) {
      val pq = Similarity.pqTopKExact(adv, "vec_id", "embedding",
          aq, "qid", "qvec", k = 5, m = 4, codewords = 8, lloydIters = it)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val hits = aExact.count { case (q, n) =>
        pq.getOrElse(q, Set.empty).contains(n) }
      println(s"[probe] adversarial: lloydIters=$it recall@5=$hits/${aExact.size}")
    }
    spark.stop()
  }
}
