package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Classifier, Stopwords, TextAnalysis}

/** Stage-split timing for `x_text_langid_trained` (dev tool, r20):
  * attributes wall-clock to the bootstrap heuristic, the feature +
  * round-loop training pass, the scoring join, and the bare gram pass —
  * the split that drove the fused `char_gram_buckets` expression and the
  * columnar one-vs-rest rounds (classes in COLUMNS, so every round pays
  * single-class exchange volume).
  * Two passes: pass 1 is cold (JIT + codegen), pass 2 is the steady
  * number. */
object ProbeLangId {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-22s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    docs.count()
    val classes = Stopwords.all.keys.toSeq.sorted
    // warm run then timed run
    for (round <- 1 to 2) {
      println(s"--- pass $round ---")
      val boot = t("bootstrap") {
        val b = TextAnalysis.langId(docs, "text")
          .select(col("doc_id"), col("predicted_lang").as("__label"))
        b.count(); b
      }
      val labeled = docs.join(boot, "doc_id")
      val (w, feats) = t("train (feats+2 rounds)") {
        Classifier.trainLangIdWithFeats(labeled, "doc_id", "text",
          "__label", classes, n = 3, dims = 256, rounds = 2)
      }
      t("score") {
        Classifier.langIdTrainedOnFeats(docs.select("doc_id"), feats, w,
          classes).count()
      }
      t("gram pass alone") {
        docs.select(explode(graft.functions.GraftFunctions
          .charGramBuckets(col("text"), 3, 256)).as("b"))
          .groupBy("b").count().count()
      }
    }
    spark.stop()
  }
}
