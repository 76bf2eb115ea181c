package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR, prints one
  * JSON line {"metric":...,"queries":{name:sec},...}. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/parquet-footer warmup so the first measured query isn't
    // charged for session startup
    (1 to 2).foreach { _ =>
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
      spark.read.parquet(s"$sfDir/orders.parquet").limit(1000).count()
    }
    // stable order: catalog order. Adaptive repetition: every query runs at
    // least `minReps` times and sub-second queries keep repeating (up to
    // `maxReps`) until ~2 s of measurement accumulates — same-JVM runs showed
    // 4-5× swings on identical sub-second plans at n=2, drowning real
    // regressions. Reported value = per-query MIN (the standard same-machine
    // noise-robust statistic; anything above it is scheduler/GC/JIT noise,
    // not the plan). A thrown query reports -1. The per-query spread
    // (median/min - 1) is summarized in `noise_med`/`noise_max` so a future
    // run can tell jitter from regression. Note the repo's decode-once
    // persisted fixtures mean rep 1 pays any cache materialization; min
    // therefore reflects steady state, the architecture's intended
    // operating point.
    val minReps = math.max(2, sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt)
    val maxReps = math.max(minReps, sys.env.getOrElse("SPARK_GRAFT_MAX_REPS", "9").toInt)
    val budgetSec = 2.0
    // SPARK_GRAFT_ONLY=a,b,c restricts the run — the isolation probe for
    // re-measuring one query without the 90-query suite around it
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = (QueryCatalog.all ++ QueryCatalog.entryOps)
      .filter(q => only.forall(_.contains(q.name)))
    val results = selected.map { q =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var spent = 0.0
      while (times.size < minReps ||
          (times.size < maxReps && spent < budgetSec && !times.exists(_ < 0))) {
        val t0 = System.nanoTime()
        val t = try { q.fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case _: Throwable => -1.0 }
        times += t
        spent += math.max(t, 0.0)
      }
      val sorted = times.sorted
      val stat =
        if (times.exists(_ < 0)) (-1.0, -1.0)
        else (sorted.head, sorted((times.size - 1) / 2))
      (q.name, stat._1, stat._2)
    }
    val qs = results.map { case (k, mn, _) => "\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val spreads = results.collect { case (_, mn, md) if mn > 0 => md / mn - 1.0 }.sorted
    val noiseMed = if (spreads.isEmpty) 0.0 else spreads((spreads.size - 1) / 2)
    val noiseMax = if (spreads.isEmpty) 0.0 else spreads.last
    println(s"""{"metric":"total","value":$total,"unit":"sec","stat":"min","reps_min":$minReps,"reps_max":$maxReps,"noise_med":$noiseMed,"noise_max":$noiseMax,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
