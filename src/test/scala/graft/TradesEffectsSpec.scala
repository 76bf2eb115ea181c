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

  test("trades: path-payment strict-send atoms get synthetic ids and seller_is_exact") {
    val pp = StellarTradesEffects.historyTrades(fixture)
      .where(col("seller_is_exact").isNotNull).collect()
    assert(pp.nonEmpty)
    pp.foreach { r =>
      val exact = r.getAs[Boolean]("seller_is_exact")
      // strict-send (13) → true; strict-receive (2) → false
      assert(exact == ((r.getAs[Long]("buying_offer_id") & (1L << 62)) != 0) ||
        !exact)
    }
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
