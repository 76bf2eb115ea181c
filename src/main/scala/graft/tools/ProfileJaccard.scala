package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** One-off timing for the Jaccard pair queries (dev tool). */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.limit(10).count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }
    (1 to 2).foreach { round =>
      time(s"pairs r$round") {
        Dedup.ngramJaccardPairs(docs.where(col("doc_id") < 300),
          "text", "doc_id", n = 1, threshold = 0.5).count()
      }
      time(s"dfcut r$round") {
        Dedup.ngramJaccardPairsWithDfCut(docs, "text", "doc_id",
          n = 1, threshold = 0.5, maxDfFraction = Some(0.1)).count()
      }
    }
    spark.stop()
  }
}
