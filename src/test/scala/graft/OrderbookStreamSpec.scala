package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.OrderbookStream
import graft.streaming.OrderbookStream.{OfferChange, OfferEvent}

class OrderbookStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-orderbook-stream-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val lifecycle = Seq(
    OfferChange(1L, 10L, 0L, "acctA", 100.0, 1, 2, deleted = false), // created
    OfferChange(1L, 11L, 0L, "acctA", 80.0, 1, 2, deleted = false),  // updated
    OfferChange(1L, 12L, 0L, "acctA", 0.0, 1, 2, deleted = true),    // removed
    OfferChange(2L, 11L, 1L, "acctB", 50.0, 3, 4, deleted = false),  // created
    OfferChange(3L, 10L, 0L, "acctC", 5.0, 1, 1, deleted = true))    // no-op delete

  test("batch mode: per-offer lifecycle emits created/updated/removed in order") {
    import spark.implicits._
    val out = OrderbookStream.offerEvents(lifecycle.toDS()).collect()
      .groupBy(_.offer_id)
    assert(out(1L).map(_.action).toSeq == Seq("created", "updated", "removed"))
    assert(out(1L)(1).amount == 80.0)
    assert(out(2L).map(_.action).toSeq == Seq("created"))
    assert(!out.contains(3L)) // delete of unknown offer emits nothing
  }

  test("streaming mode: state carries across micro-batches via the state store") {
    import spark.implicits._
    val landing = Files.createTempDirectory("ob-landing").toString
    val ckpt = Files.createTempDirectory("ob-ckpt").toString
    val outDir = Files.createTempDirectory("ob-out").toString

    // batch 1: create offer 5
    Seq(OfferChange(5L, 20L, 0L, "acctZ", 42.0, 2, 1, deleted = false))
      .toDS().write.mode("append").parquet(landing)
    def run(): org.apache.spark.sql.streaming.StreamingQuery = {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[OfferChange]].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing).as[OfferChange]
      val q = OrderbookStream.offerEvents(stream).writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .start()
      q.awaitTermination(120000)
      q
    }
    run()
    // batch 2 (separate run, state restored from checkpoint): update offer 5
    Seq(OfferChange(5L, 21L, 0L, "acctZ", 10.0, 2, 1, deleted = false))
      .toDS().write.mode("append").parquet(landing)
    val q2 = run()

    // micro-batch plan audit: the restarted run reads ONLY the new file
    // (no re-scan of committed input per trigger) and carries exactly one
    // offer in the managed state store (restored, not rebuilt)
    val progs = q2.recentProgress.filter(_.numInputRows > 0)
    assert(progs.map(_.numInputRows).sum == 1,
      progs.map(_.numInputRows).mkString(","))
    val stateOps = q2.recentProgress.flatMap(_.stateOperators)
    assert(stateOps.nonEmpty && stateOps.exists(_.numRowsTotal == 1),
      stateOps.map(_.numRowsTotal).mkString(","))

    import org.apache.spark.sql.functions.col
    val events = spark.read.parquet(outDir).as[OfferEvent]
      .orderBy(col("ledger_sequence")).collect()
    // the second batch must see the offer as EXISTING (updated, not created)
    assert(events.map(_.action).toSeq == Seq("created", "updated"))
    assert(events(1).amount == 10.0)
  }
}
