package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.StellarTransforms
import graft.sources.StellarFixture

/** Soroban fee decomposition semantics (`transaction.go:131-191`). */
class SorobanFeeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-soroban-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // ledger 1004: protocol 21 (1004%3!=0), txs t=0..4
  lazy val txs = StellarTransforms.historyTransactions(
    StellarFixture.ledgers(spark, 1004, 1004)).orderBy("id").collect()

  test("non-soroban txs have zeroed fee decomposition") {
    val t1 = txs(1) // t=1: no soroban
    assert(t1.getAs[Long]("resource_fee") == 0L)
    assert(t1.getAs[Long]("inclusion_fee_bid") == 0L)
    assert(t1.getAs[Long]("resource_fee_refund") == 0L)
  }

  test("soroban tx: inclusion bid/charged and refund from fee-meta diffs") {
    val t2 = txs(2) // t=2: soroban, fee_changes -(45000+2), refund 6000
    assert(t2.getAs[Long]("resource_fee") == 40002L)
    // bid = max_fee - resource_fee = 5002 - 40002
    assert(t2.getAs[Long]("inclusion_fee_bid") == 5002L - 40002L)
    // charged = (balance diff 45002) - resource fee 40002 = 5000
    assert(t2.getAs[Long]("inclusion_fee_charged") == 5000L)
    assert(t2.getAs[Long]("resource_fee_refund") == 6000L)
    assert(t2.getAs[Long]("non_refundable_resource_fee_charged") == 30002L)
    assert(t2.getAs[Long]("rent_fee_charged") == 1200L)
  }

  test("fee bump: fee_account is the bump account; inner hash carried") {
    val t4 = txs(4) // t=4: fee bump + soroban
    assert(t4.getAs[String]("fee_account") != null)
    assert(t4.getAs[String]("fee_account").startsWith("G"))
    assert(t4.getAs[String]("fee_account") !=
      t4.getAs[String]("account")) // bump account != source
    assert(t4.getAs[String]("inner_transaction_hash").matches("[0-9a-f]{64}"))
    assert(t4.getAs[Long]("new_max_fee") == 10004L)
    // protocol 21: fee_charged NOT recomputed
    assert(t4.getAs[Long]("fee_charged") == 100L * 5)
  }

  test("P20 fee-bump bug workaround: protocol 20 recomputes fee_charged") {
    // ledger 1002: protocol 20 (1002%3==0), has t=0..2 → no fee-bump tx (t=4)
    // use ledger 1014 (protocol 20, 1014%5=4 → 5 txs incl. t=4 bump)
    val bumped = StellarTransforms.historyTransactions(
        StellarFixture.ledgers(spark, 1014, 1014))
      .orderBy("id").collect()(4)
    // fee_charged = resource_fee - refund = 40004 - 6000
    assert(bumped.getAs[Long]("fee_charged") == 40004L - 6000L)
  }
}
