package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.ChangeStream

/** End-to-end Structured Streaming test of the unbounded change-export path:
  * parquet files land → streaming read → per-batch compaction → partitioned
  * parquet sink, exactly-once via AvailableNow + checkpoint. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-streaming-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("change stream compacts each batch and appends partitioned output") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft-landing").toString
    val out = Files.createTempDirectory("graft-out").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    // two "ledger file" drops: overlapping keys within and across batches
    Seq(("k1", 1L, "a"), ("k1", 5L, "b"), ("k2", 3L, "x"))
      .toDF("key", "seq", "state").write.mode("append").parquet(landing)
    Seq(("k1", 70L, "c"), ("k3", 65L, "y"))
      .toDF("key", "seq", "state").write.mode("append").parquet(landing)

    val schemaSource = spark.read.parquet(landing)
    val stream = ChangeStream.readChanges(spark, landing, schemaSource)
    assert(stream.isStreaming)

    ChangeStream.writeCompactedBatches(
      stream, keyCols = Seq("key"), seqCol = "seq", orderCols = Seq("seq"),
      outDir = out, checkpointDir = ckpt)
      .start().awaitTermination(120000)

    val result = spark.read.parquet(out)
      // partition-dir type inference yields int; normalize for the assert
      .select(col("key"), col("batch_id").cast("long").as("batch_id"),
        col("seq"), col("state"))
      .orderBy("key", "batch_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))

    // batch 0 (seq<64): k1 compacts to seq=5 "b"; batch 1: k1→"c", k3→"y"
    assert(result.toSet == Set(
      ("k1", 0L, 5L, "b"), ("k2", 0L, 3L, "x"),
      ("k1", 1L, 70L, "c"), ("k3", 1L, 65L, "y")))

    // restart with same checkpoint + no new files → no duplicate output,
    // and the micro-batch progress proves no committed file is re-scanned
    // (zero input rows across every trigger of the restarted query)
    val q2 = ChangeStream.writeCompactedBatches(
      ChangeStream.readChanges(spark, landing, schemaSource),
      Seq("key"), "seq", Seq("seq"), out, ckpt)
      .start()
    q2.awaitTermination(60000)
    assert(q2.recentProgress.map(_.numInputRows).sum == 0,
      q2.recentProgress.map(_.numInputRows).mkString(","))
    assert(spark.read.parquet(out).count() == 4)
  }

  test("windowed counts produce an event-time tumbling aggregation (batch mode)") {
    import spark.implicits._
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "account"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "account"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:07:00"), "offer")
    ).toDF("closed_at", "entry_type")
    val out = ChangeStream.windowedCounts(df, "closed_at").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("n_changes")).sum == 3)
  }
}
