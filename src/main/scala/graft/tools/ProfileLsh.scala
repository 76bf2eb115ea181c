package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-clock breakdown of the embedding-LSH dedup path —
  * the profiling aid behind the round-11 hot-path work. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val pairs = graft.operators.Dedup.cosineDupPairsLsh(
        emb, "vec_id", "embedding", 4, 25)
      time("pairs.count")(println("  pairs=" + pairs.count()))
      val clusters = graft.operators.Dedup.dupClusters(
        emb.select("vec_id"), "vec_id", pairs, "id_a", "id_b")
      time("clusters.count")(println("  clusters=" + clusters.count()))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
