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
      assert(asset == "native" || asset.matches("credit_alphanum4:[A-Z]+\\d+:ISS?\\d+"),
        asset)
      // counterparties: accounts (G), pools (L), claimable balances (B),
      // or contracts (C) for SAC event legs
      assert(r.getAs[String]("to").matches("[GLBC].*"), r.getAs[String]("to"))
      assert(r.getAs[String]("from").matches("[GLBC].*"), r.getAs[String]("from"))
    }
    assert(transfers.exists(_.getAs[String]("to_muxed_id") != null))
  }

  test("value-moving breadth: events from ≥10 op types with exact leg counts") {
    val ops = graft.operators.StellarTransforms.historyOperations(fixture)
      .select(col("id").as("operation_id"), col("type").as("op_type"))
    val legs = events.where(col("operation_id").isNotNull)
      .join(ops, "operation_id")
    val byType = legs.groupBy("op_type")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Int]("op_type") -> r.getAs[Long]("n")).toMap
    // all value-moving op families present
    assert(Set(0, 1, 2, 3, 4, 8, 12, 13, 14, 15, 19, 20, 22, 23)
      .subsetOf(byType.keySet), byType.keySet.toString)
    // trades: 2 legs per claim atom; path payments: +1 delivery leg
    val perOp = legs.groupBy("operation_id", "op_type")
      .agg(count(lit(1)).as("n")).collect()
    perOp.foreach { r =>
      val (t, n) = (r.getAs[Int]("op_type"), r.getAs[Long]("n"))
      t match {
        case 3 | 4 | 12 => assert(n == 2 || n == 4, s"op $t: $n legs")
        case 2 | 13 => assert(n == 3 || n == 5, s"op $t: $n legs")
        case 22 | 23 => assert(n == 2, s"op $t: $n legs")
        case 9 => assert(n == 2, s"op $t: $n legs") // one mint per payout
        case 24 => assert(n == 2, s"op $t: $n legs") // junk event dropped
        case _ => assert(n == 1, s"op $t: $n legs")
      }
    }
    // LP + CB counterparties use typed strkey addresses
    assert(legs.where(col("op_type").isin(22, 23) &&
      !(col("from").startsWith("L") || col("to").startsWith("L"))).count() == 0)
    assert(legs.where(col("op_type").isin(14, 15) &&
      !(col("from").startsWith("B") || col("to").startsWith("B"))).count() == 0)
  }

  test("payments to the issuer classify as burns; clawbacks as clawback") {
    assert(events.where(col("event_topic") === "burn").count() > 0)
    assert(events.where(col("event_topic") === "clawback").count() > 0)
    // payment-derived burns are never native (issuer keys only exist for
    // credit assets); SAC event legs may burn native
    val ops = graft.operators.StellarTransforms.historyOperations(fixture)
      .select(col("id").as("operation_id"), col("type").as("op_type"))
    assert(events.where(col("event_topic") === "burn" &&
        col("asset") === "native")
      .join(ops, "operation_id")
      .where(col("op_type") =!= 24).count() == 0)
  }

  test("VerifyEvents: fee events reconcile with envelope fees") {
    assert(TokenTransfers.verify(events, fixture).count() == 0)
    // corrupt one fee event → verify flags exactly those transactions
    val corrupted = events.withColumn("amount_raw",
      when(col("event_topic") === "fee" && col("ledger_sequence") === 3000,
        lit("999999")).otherwise(col("amount_raw")))
    assert(TokenTransfers.verify(corrupted, fixture).count() > 0)
  }
}
