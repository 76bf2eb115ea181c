package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.TokenTransfers
import graft.sources.StellarFixture

class TokenTransferSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-tt-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  lazy val fixture = StellarFixture.ledgers(spark, 3000, 3079)
  lazy val events = TokenTransfers.fromLedgers(fixture).cache()

  test("every transaction emits exactly one fee event from the fee account") {
    val fees = events.where(col("event_topic") === "fee")
    val txCount = fixture.select(explode(col("transactions"))).count()
    assert(fees.count() == txCount)
    assert(fees.where(col("asset") =!= "native").count() == 0)
    assert(fees.where(!col("from").startsWith("G")).count() == 0)
  }

  test("payments become transfers; canonical asset strings; muxed ids kept") {
    val transfers = events.where(col("event_topic") === "transfer").collect()
    assert(transfers.nonEmpty)
    transfers.foreach { r =>
      val asset = r.getAs[String]("asset")
      assert(asset == "native" || asset.matches("credit_alphanum4:TK\\d+:ISS\\d+"))
      assert(r.getAs[String]("to").startsWith("G"))
    }
    assert(transfers.exists(_.getAs[String]("to_muxed_id") != null))
  }

  test("payments to the issuer classify as burns; clawbacks as clawback") {
    assert(events.where(col("event_topic") === "burn").count() > 0)
    assert(events.where(col("event_topic") === "clawback").count() > 0)
    // burns are never native (issuer key only defined for credit assets)
    assert(events.where(col("event_topic") === "burn" &&
      col("asset") === "native").count() == 0)
  }

  test("VerifyEvents: fee events reconcile with envelope fees") {
    assert(TokenTransfers.verify(events, fixture).count() == 0)
    // corrupt one fee event → verify flags exactly those transactions
    val corrupted = events.withColumn("amount",
      when(col("event_topic") === "fee" && col("ledger_sequence") === 3000,
        lit("999999")).otherwise(col("amount")))
    assert(TokenTransfers.verify(corrupted, fixture).count() > 0)
  }
}
