package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Checkpoints, Dedup, TextAnalysis}

/** Stage-split timing for `x_curation_pipeline_v2` (dev tool, r19
  * judge directive #8): times the composition at its two checkpoint
  * boundaries so the cost can be attributed to (1) the bigram-LM
  * surprisal gate, (2) SemDeDup over the survivors' embeddings,
  * (3) sequence packing + provenance joins. Each stage ends in a
  * materialization (localCheckpoint / count) so the wall-clock split
  * is real, not lazy-plan attribution. */
object ProfileV2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    def table(name: String) =
      spark.read.parquet(s"$sfDir/$name.parquet")

    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      val docs = table("documents")

      // Stage 1: bigram-LM training + surprisal scoring + mean gate,
      // materialized at the checkpoint exactly as the catalog query does.
      val gate = t("gate (LM+surprisal+thr)") {
        val scored = TextAnalysis.bigramSurprisal(docs, "doc_id", "text")
          .where(col("n_bigrams") > 0)
        val thr = scored.agg(
          expr("sum(mean_millibits) div count(*)").as("thr"))
        scored.join(broadcast(thr))
          .where(col("mean_millibits") <= col("thr"))
          .select("doc_id", "mean_millibits")
          .transform(Checkpoints.checkpointed)
      }

      // Stage 2: embedding join + SemDeDup, materialized at the second
      // checkpoint.
      val kept = t("semdedup (IVF cells+verify)") {
        val joined = gate.join(table("embeddings"),
            gate("doc_id") === col("vec_id"))
          .select(col("doc_id"), col("mean_millibits"), col("embedding"))
        val sem = Dedup.semanticDedup(joined, "doc_id", "embedding",
          nCells = 8, cosNum = 4, cosDen = 25)
        sem.where(!col("is_dup"))
          .select(col("id").as("doc_id"), col("cell"))
          .transform(Checkpoints.checkpointed)
      }

      // Stage 3: token counts + packing + provenance joins + sort.
      val n = t("pack (tokens+window+joins)") {
        val withTok = kept
          .join(docs.select(col("doc_id"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok")),
            "doc_id")
        TextAnalysis.packSequences(
            withTok.select(col("doc_id"), col("n_tok")),
            "doc_id", "n_tok", budget = 512L, shards = 4)
          .join(kept, "doc_id")
          .join(gate, "doc_id")
          .select(col("doc_id"), col("mean_millibits"), col("cell"),
            col("shard"), col("n_tokens").cast("long").as("n_tokens"),
            col("pack_id"))
          .orderBy("doc_id")
          .count()
      }
      println(s"rows: $n")
    }
    spark.stop()
  }
}
