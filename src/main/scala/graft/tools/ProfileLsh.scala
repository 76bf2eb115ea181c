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
      val pairs2 = graft.operators.Dedup.cosineDupPairsLsh(
        emb, "vec_id", "embedding", 4, 25)
      val alt = graft.operators.Dedup.dupClustersAlternating(
        emb.select("vec_id"), "vec_id", pairs2, "id_a", "id_b")
      time("alternating.count")(println("  clusters=" + alt.count()))
      spark.catalog.clearCache()
      // per-job wall clock inside the composed call: gaps between jobs are
      // driver plan-compile time
      val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val jl = new org.apache.spark.scheduler.SparkListener {
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(e.jobId, e.time)
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val d = (e.time - starts.getOrDefault(e.jobId, e.time)) / 1e3
          jobLog.add(f"    job ${e.jobId}%3d ${d}%.2f s")
        }
      }
      spark.sparkContext.addSparkListener(jl)
      // the bench-shaped call: ONE count over the whole composed query,
      // fresh frames, no pre-materialized stage
      time("composed (bench shape)") {
        val e2 = spark.read.parquet(s"$dir/embeddings.parquet")
        val c = graft.operators.Dedup.dupClusters(
          e2.select("vec_id"), "vec_id",
          graft.operators.Dedup.cosineDupPairsLsh(
            e2, "vec_id", "embedding", 4, 25),
          "id_a", "id_b").orderBy("vec_id")
        println("  rows=" + c.count())
      }
      spark.sparkContext.removeSparkListener(jl)
      jobLog.forEach(l => println(l))
      spark.catalog.clearCache()
      // the bench shape routed through the alternating O(log n) closure
      time("composed-alternating") {
        val e2 = spark.read.parquet(s"$dir/embeddings.parquet")
        val c = graft.operators.Dedup.dupClustersAlternating(
          e2.select("vec_id"), "vec_id",
          graft.operators.Dedup.cosineDupPairsLsh(
            e2, "vec_id", "embedding", 4, 25),
          "id_a", "id_b").orderBy("vec_id")
        println("  rows=" + c.count())
      }
      spark.catalog.clearCache()
      // stage-split of the composed shape: where do the seconds live?
      locally {
        val e2 = spark.read.parquet(s"$dir/embeddings.parquet")
        val pr = graft.operators.Dedup.cosineDupPairsLsh(
          e2, "vec_id", "embedding", 4, 25)
        val edges0 = pr.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionAll(pr.select(col("id_b").as("src"), col("id_a").as("dst")))
          .distinct().persist()
        time("  edges0.count")(println("  edges=" + edges0.count()))
        val cl = graft.operators.Dedup.dupClusters(
          e2.select("vec_id"), "vec_id", pr, "id_a", "id_b")
        time("  clusters after edges")(println("  rows=" + cl.count()))
        edges0.unpersist()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
