package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-split timing for `x_curation_pipeline_v8` (dev tool, r20): runs
  * the whole catalog query twice (pass 1 cold — JIT + codegen; pass 2 the
  * steady number) with per-stage wall-clock attributed via the Spark
  * listener job timeline printed at the end. Coarse but enough to see
  * which composition segment dominates. */
object ProbeV8 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.QueryCatalog.all
      .find(_.name == "x_curation_pipeline_v8").get.fn
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val ends = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(e.jobId, (e.time,
            Option(e.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .orElse(Option(e.properties)
                .flatMap(p => Option(p.getProperty("callSite.short"))))
              .getOrElse("?")))
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          ends.put(e.jobId, e.time)
      })
    for (pass <- 1 to 2) {
      jobs.clear(); ends.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"--- pass $pass: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows ---")
      import scala.jdk.CollectionConverters._
      val rows = jobs.asScala.toSeq.sortBy(_._1).map { case (id, (st, d)) =>
        (id, (ends.getOrDefault(id, st) - st) / 1e3, d.take(90))
      }
      rows.filter(_._2 > 0.15).foreach { case (id, sec, d) =>
        println(f"  job $id%3d ${sec}%6.2f s  $d")
      }
    }
    spark.stop()
  }
}
