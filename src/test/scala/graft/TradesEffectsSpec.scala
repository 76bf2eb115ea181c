package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.StellarTradesEffects
import graft.sources.StellarFixture

class TradesEffectsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-trades-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  lazy val fixture = StellarFixture.ledgers(spark, 2000, 2039)

  test("trades: pre-state price via reverse change scan beats stale change") {
    val trades = StellarTradesEffects.historyTrades(fixture)
    val offerTrades = trades.where(col("trade_type") === 1 &&
      col("selling_offer_id").isNotNull).collect()
    assert(offerTrades.nonEmpty)
    // fixture plants a stale (1/99) change before the authoritative (7/2):
    // the reverse scan must pick 7/2
    offerTrades.foreach { r =>
      assert(r.getAs[Long]("price_n") == 7L)
      assert(r.getAs[Long]("price_d") == 2L)
    }
  }

  test("trades: LP atoms carry pool fee, hex id, strkey L-address, type 2") {
    val lp = StellarTradesEffects.historyTrades(fixture)
      .where(col("trade_type") === 2).collect()
    assert(lp.nonEmpty)
    lp.foreach { r =>
      assert(r.getAs[Long]("liquidity_pool_fee") == 30L)
      assert(r.getAs[String]("selling_liquidity_pool_id").matches("[0-9a-f]{64}"))
      assert(r.getAs[String]("selling_liquidity_pool_id_strkey").startsWith("L"))
      assert(r.isNullAt(r.fieldIndex("selling_offer_id")))
      // LP atom has no on-chain offer → synthetic bit-62 buying id
      assert((r.getAs[Long]("buying_offer_id") & (1L << 62)) != 0)
    }
  }

  // fixture law: op_type = (ledger + txIdx + opIdx) % 27; recover the
  // producing op from the TOID to assert exact per-type expectations
  private def opTypeOf(operationId: Long): Int = {
    val (l, t1, o1) = graft.codec.Toid.unpack(operationId)
    ((l + (t1 - 1) + (o1 - 1)) % 27).toInt
  }

  test("trades: seller_is_exact is exactly receive→true / send→false / else null") {
    val rows = StellarTradesEffects.historyTrades(fixture).collect()
    assert(rows.nonEmpty)
    var sawReceive, sawSend, sawOffer = false
    rows.foreach { r =>
      val ty = opTypeOf(r.getAs[Long]("history_operation_id"))
      val i = r.fieldIndex("seller_is_exact")
      ty match {
        case 2  => assert(!r.isNullAt(i) && r.getBoolean(i)); sawReceive = true
        case 13 => assert(!r.isNullAt(i) && !r.getBoolean(i)); sawSend = true
        case _  => assert(r.isNullAt(i)); sawOffer = true
      }
    }
    assert(sawReceive && sawSend && sawOffer)
  }

  test("trades: buying_offer_id is the result offer when present, else (toid+1)|bit62") {
    val rows = StellarTradesEffects.historyTrades(fixture).collect()
    rows.foreach { r =>
      val opId = r.getAs[Long]("history_operation_id")
      val ty = opTypeOf(opId)
      val o = graft.codec.Toid.opIndexOf(opId) - 1 // 0-based fixture op index
      val buying = r.getAs[Long]("buying_offer_id")
      if (Seq(3, 4, 12).contains(ty) && o % 2 == 0)
        assert(buying == 7000L + o) // ManageOfferSuccess result offer
      else
        assert(buying == ((opId + 1) | (1L << 62))) // trade.go:119
      // offer-type atoms always carry the CLAIMED offer id (trade.go:111),
      // including path payments; never the taker's
      if (r.getAs[Int]("trade_type") == 1)
        assert(r.getAs[Long]("selling_offer_id") >= 5000L &&
          r.getAs[Long]("selling_offer_id") < 7000L)
    }
  }

  test("trades: buyer address prefers the op source account over the tx source") {
    val rows = StellarTradesEffects.historyTrades(fixture).collect()
    // fixture: op source set unless opIdx%3==0 → both branches must occur,
    // and every address must be a valid strkey G-address
    val addrs = rows.map { r =>
      val opId = r.getAs[Long]("history_operation_id")
      val (l, t1, o1) = graft.codec.Toid.unpack(opId)
      val expectedKey =
        if ((o1 - 1) % 3 == 0) graft.codec.Hashes.sha256(s"acct-$l-${t1 - 1}".getBytes("UTF-8"))
        else graft.codec.Hashes.sha256(s"op-$l-${t1 - 1}-${o1 - 1}".getBytes("UTF-8"))
      (r.getAs[String]("buying_account_address"),
        graft.codec.Strkey.encodeAccountId(expectedKey))
    }
    assert(addrs.nonEmpty)
    addrs.foreach { case (actual, expected) => assert(actual == expected) }
  }

  test("effects: ids are {opId}-{index}, payments fan out, trades from atoms") {
    val effects = StellarTradesEffects.historyEffects(fixture)
    val pay = effects.where(col("type").isin(2, 3)).collect()
    assert(pay.nonEmpty)
    val grouped = pay.groupBy(_.getAs[Long]("operation_id"))
    grouped.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("type")).sorted.toSeq == Seq(2, 3))
      assert(rows.map(_.getAs[String]("id")).forall(id =>
        id.matches("\\d+-\\d")))
    }
    val trades = effects.where(col("type") === 33)
    assert(trades.count() > 0)
    // effects only from successful txs
    assert(effects.count() ==
      StellarTradesEffects.historyEffects(fixture).count())
  }

  test("LP path-payment trades carry exact-rational rounding slippage") {
    val lp = StellarTradesEffects.historyTrades(fixture)
      .where(col("trade_type") === 2).collect()
    assert(lp.nonEmpty)
    lp.foreach { r =>
      val slippage = r.getAs[Long]("rounding_slippage")
      val amount = (r.getAs[Double]("selling_amount") * 1e7).round
      val expect = graft.codec.AmmMath
        .roundingSlippageBips(5000000000L, 3000000000L, amount, 30L)
      assert(expect.contains(slippage))
      assert(slippage >= 0 && slippage < 10000)
    }
    // scalar math sanity: floor-loss of a tiny payout is large in bips
    val (payout, slip) = graft.codec.AmmMath.poolPayout(1000000L, 7L, 500000L, 30L).get
    assert(payout >= 1 && slip >= 0)
  }

  test("plan stays shuffle-free up to the explode (intra-row pre-state)") {
    val plan = StellarTradesEffects.historyTrades(fixture)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert(plan.contains("Generate"))
  }
}
