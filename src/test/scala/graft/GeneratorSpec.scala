package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators._

/** Specs for the flat-map generators (effects, trades) and entry projections. */
class GeneratorSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-generator-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("effects: payment ops fan out to credited+debited; failed txs drop out") {
    import spark.implicits._
    val ops = Seq(
      (100L, 1, 5.0, 7L, true),   // payment → 2 effects
      (200L, 0, 1.0, 8L, true),   // create → 1 effect
      (300L, 7, 2.0, 9L, true),   // other → op_applied
      (400L, 1, 3.0, 9L, false)   // failed tx → nothing
    ).toDF("operation_id", "op_type", "amount", "source_account",
      "transaction_successful")
    val out = Effects.fromOperations(ops).orderBy("operation_id", "effect_index")
      .collect()
    assert(out.length == 4)
    assert(out.map(_.getAs[String]("effect_id")).toSeq ==
      Seq("100-1", "100-2", "200-1", "300-1"))
    assert(out.map(_.getAs[String]("effect_type")).toSeq ==
      Seq("account_credited", "account_debited", "account_created", "op_applied"))
    // null amount for non-monetary effects
    assert(out(3).isNullAt(out(3).fieldIndex("amount")))
  }

  test("trades: atom count follows part_key parity; synthetic ids tag odd atoms") {
    import spark.implicits._
    val tradeOps = Seq(
      (1000L, 5L, 1L, 10.0, 3L),  // part_key odd → 2 atoms
      (2000L, 6L, 2L, 8.0, 4L)    // part_key even → 1 atom
    ).toDF("operation_id", "ledger_sequence", "application_order", "amount",
      "part_key")
    val out = Trades.fromTradeOps(tradeOps).orderBy("operation_id", "atom_index")
      .collect()
    assert(out.length == 3)
    val first = out(0)
    assert(first.getAs[Double]("selling_amount") == 5.0) // 10/2
    assert(first.getAs[Long]("buying_offer_id") == 1000L) // atom 0: real id
    val second = out(1)
    assert((second.getAs[Long]("buying_offer_id") & (1L << 62)) != 0) // synthetic
    assert(!second.getAs[Boolean]("seller_is_exact"))
  }

  test("sponsor lookup finds first sponsoring op intra-row, null when absent") {
    import spark.implicits._
    val ledgers = Seq(
      (1L, Seq((6, 77L), (1, 10L))), // sponsor present (op_type 6)
      (2L, Seq((1, 20L)))            // none
    ).toDF("ledger_sequence", "txs")
      .select(col("ledger_sequence"),
        transform(col("txs"), t => struct(
          t.getField("_1").as("op_type"), t.getField("_2").as("supp_key")))
          .as("transactions"))
    val out = EntryProjections.withSponsor(ledgers)
      .orderBy("ledger_sequence", "tx_order").collect()
    assert(out(0).getAs[Long]("sponsor") == 77L)
    assert(out(1).getAs[Long]("sponsor") == 77L)
    assert(out(2).isNullAt(out(2).fieldIndex("sponsor")))
  }

  test("signers ranked by weight desc with deterministic tie-break") {
    import spark.implicits._
    val signers = Seq(
      ("acct", 1L, 5.0), ("acct", 2L, 9.0), ("acct", 3L, 5.0)
    ).toDF("account", "signer", "weight")
    val out = EntryProjections.signersRanked(signers, "account", "signer", "weight")
      .orderBy("signer_rank").collect()
    assert(out.map(_.getAs[Long]("signer")).toSeq == Seq(2L, 1L, 3L))
  }
}
