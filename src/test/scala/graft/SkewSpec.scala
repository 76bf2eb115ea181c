package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Skew

/** Task-level proof that salting actually spreads a hot key: one key owns
  * 50% of the probe rows, and the salted join's max per-task shuffle read
  * must be a small fraction of the plain join's (the hot key's rows land
  * on `salts` tasks instead of one).
  *
  * AQE is OFF here deliberately: AQE's skew-join handling splits oversized
  * sort-merge partitions at runtime and is the FIRST tool to reach for —
  * this operator is for the shapes AQE cannot rebalance (a skewed join
  * feeding a stateful aggregate in the same stage, skew under a
  * non-sort-merge shape, or engines/stages where AQE is disabled), and
  * for deterministic layouts independent of runtime stats. */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-skew-test")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private class MaxShuffleRead extends SparkListener {
    @volatile var maxRecords = 0L
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null && m.shuffleReadMetrics != null) {
        val r = m.shuffleReadMetrics.recordsRead
        if (r > maxRecords) maxRecords = r
      }
    }
  }

  private def maxTaskShuffleRead(action: => Unit): Long = {
    val l = new MaxShuffleRead
    spark.sparkContext.addSparkListener(l)
    try {
      action
      // listener bus drains asynchronously after the job ends
      val deadline = System.currentTimeMillis() + 10000
      var last = -1L
      while (System.currentTimeMillis() < deadline && l.maxRecords != last) {
        last = l.maxRecords
        Thread.sleep(300)
      }
      l.maxRecords
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("salted join: max task input drops to ~1/salts of the plain join's") {
    import spark.implicits._
    val salts = 8
    // one key = 50% of the probe rows (20k of 40k); build side too big to
    // assume broadcastable (forced off above)
    val probe = (0 until 40000)
      .map(i => (if (i % 2 == 0) 0L else (i % 1000).toLong, i.toLong))
      .toDF("k", "row_id")
    val build = (0 until 1000).map(i => (i.toLong, s"payload$i"))
      .toDF("k", "b_payload")

    val plainMax = maxTaskShuffleRead {
      probe.join(build, Seq("k")).count()
    }
    val saltedMax = maxTaskShuffleRead {
      Skew.saltedJoin(probe, build, Seq("k"), "row_id", salts).count()
    }
    // the hot key's 20k rows occupied ONE task before and up to `salts`
    // tasks after; the bound is salts/3 rather than salts because two of
    // the eight (key, salt) buckets can hash into the same of the 32
    // shuffle partitions (deterministic birthday collision), and
    // replication adds |build| * salts / partitions rows per task
    assert(plainMax >= 20000, s"plain hot task read $plainMax")
    assert(saltedMax <= plainMax / 3,
      s"salting did not spread the hot key: plain=$plainMax salted=$saltedMax")

    // row parity: salting never changes the join's result
    val plainRows = probe.join(build, Seq("k"))
      .orderBy("row_id").collect().toSeq
    val saltedRows = Skew.saltedJoin(probe, build, Seq("k"), "row_id", salts)
      .select(probe.columns.map(col) ++ Seq(col("b_payload")): _*)
      .orderBy("row_id").collect().toSeq
    assert(plainRows.size == saltedRows.size && saltedRows.size == 40000)
  }
}
