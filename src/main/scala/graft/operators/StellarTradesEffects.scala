package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.model.LedgerModel.LedgerRow

/** P5 trades and P4 effects over the decoded model — the two "hard
  * semantics" items of SURVEY §7.3, kept entirely intra-row.
  *
  * Trades (`transform/trade.go:21-162`): one row per claim atom of each
  * trade-producing op in a successful tx. The sell price comes from the
  * PRE-state of the claimed offer, found by a reverse scan of the op's
  * change list (`findTradeSellPrice:264-279`) — here the changes ride in the
  * op's nested array, so the reverse scan is `element_at(filter(...), -1)`:
  * no join, no shuffle. LP trades take the pool fee from the pre-state pool
  * entry; missing on-chain offers get synthetic bit-62 ids.
  *
  * Effects (`transform/effects.go`): per-op fan-out with the reference's
  * numeric effect types and names; trade effects derive from claim atoms. */
object StellarTradesEffects {

  /** Trade-producing op types (`input/trades.go:64`): manage_sell 3,
    * passive_sell 4, manage_buy 12, path strict receive 2 / send 13. */
  val TradeOpTypes: Seq[Int] = Seq(2, 3, 4, 12, 13)
  private val PathPaymentTypes: Seq[Int] = Seq(2, 13)

  /** Exact-rational slippage recompute (`graft.codec.AmmMath`); null only when
    * the pre-state pool change carried no reserves. An uncomputable payout
    * emits the reference's sentinel (MaxInt64 strict-receive / MinInt64
    * strict-send, `trade.go:373-393` workaround for stellar/go#4203). */
  private val roundingSlippageUdf =
    udf((dep: java.lang.Long, dis: java.lang.Long, amount: java.lang.Long,
        fee: java.lang.Long, strictReceive: java.lang.Boolean) =>
      if (dep == null || dis == null || amount == null || fee == null) None
      else Some(graft.codec.AmmMath.roundingSlippageOrSentinel(
        dep, dis, amount, fee, strictReceive)))

  private def opGrain(ledgers: Dataset[LedgerRow]): DataFrame =
    ledgers
      .select(col("sequence"), col("closed_at"),
        posexplode(col("transactions")).as(Seq("tx_pos", "tx")))
      .where(col("tx.successful")) // F3
      .select(col("sequence"), col("closed_at"), col("tx_pos"), col("tx"),
        posexplode(col("tx.operations")).as(Seq("op_pos", "op")))

  /** P5 — `history_trades` at claim-atom grain. */
  def historyTrades(ledgers: Dataset[LedgerRow]): DataFrame = {
    val ops = opGrain(ledgers)
      .where(col("op.op_type").isin(TradeOpTypes: _*))
      .where(size(col("op.claim_atoms")) > 0)

    val atoms = ops.select(
      col("sequence"), col("closed_at"), col("tx_pos"), col("op_pos"),
      col("op.op_type").as("op_type"),
      col("op.changes").as("changes"),
      // taker = op source when set, else tx source (`trade.go:123-129`)
      coalesce(col("op.source_key"), col("tx.source_key")).as("taker_key"),
      col("op.result_offer_id").as("result_offer_id"),
      posexplode(col("op.claim_atoms")).as(Seq("atom_pos", "atom")))

    // reverse scan of the op's changes for the claimed offer's pre-state:
    // last matching element = most recent change before this claim
    def lastOfferChange: Column = {
      val matches = filter(col("changes"), c =>
        c("entry_type") === "offer" &&
          c("offer_id") === col("atom.offer_id"))
      get(matches, size(matches) - 1)
    }
    def lastPoolChange: Column = {
      val matches = filter(col("changes"), c =>
        c("entry_type") === "liquidity_pool" &&
          c("pool_id") === col("atom.pool_id"))
      get(matches, size(matches) - 1)
    }

    atoms.select(
      col("atom_pos").cast("int").as("order"),
      col("closed_at").as("ledger_closed_at"),
      when(col("atom.seller_key").isNotNull,
        strkeyAccount(col("atom.seller_key"))).otherwise(lit(""))
        .as("selling_account_address"),
      col("atom.asset_sold.asset_code").as("selling_asset_code"),
      col("atom.asset_sold.asset_issuer").as("selling_asset_issuer"),
      col("atom.asset_sold.asset_type").as("selling_asset_type"),
      farmHashAssetId(col("atom.asset_sold.asset_code"),
        col("atom.asset_sold.asset_issuer"),
        col("atom.asset_sold.asset_type")).as("selling_asset_id"),
      stroopsToXlm(col("atom.amount_sold_stroops")).as("selling_amount"),
      strkeyAccount(col("taker_key")).as("buying_account_address"),
      col("atom.asset_bought.asset_code").as("buying_asset_code"),
      col("atom.asset_bought.asset_issuer").as("buying_asset_issuer"),
      col("atom.asset_bought.asset_type").as("buying_asset_type"),
      farmHashAssetId(col("atom.asset_bought.asset_code"),
        col("atom.asset_bought.asset_issuer"),
        col("atom.asset_bought.asset_type")).as("buying_asset_id"),
      stroopsToXlm(col("atom.amount_bought_stroops")).as("buying_amount"),
      // price from the pre-state offer entry; fallback = amount ratio
      // (`trade.go:85-114`)
      coalesce(lastOfferChange("pre_price_n").cast("long"),
        col("atom.amount_bought_stroops")).as("price_n"),
      coalesce(lastOfferChange("pre_price_d").cast("long"),
        col("atom.amount_sold_stroops")).as("price_d"),
      when(col("atom.atom_type") === "offer", col("atom.offer_id"))
        .as("selling_offer_id"),
      // buying side: the TAKER's offer from the op's ManageOfferSuccess result
      // (`trade.go:116-120`), never the claim atom; fully-consumed offers and
      // path payments fall back to the synthetic (opToid+1)|bit62 id
      coalesce(col("result_offer_id"),
        syntheticOfferId(col("sequence"), col("tx_pos") + 1, col("op_pos")))
        .as("buying_offer_id"),
      when(col("atom.atom_type") === "liquidity_pool",
        lower(hex(col("atom.pool_id")))).as("selling_liquidity_pool_id"),
      when(col("atom.atom_type") === "liquidity_pool",
        lastPoolChange("pre_pool_fee")).as("liquidity_pool_fee"),
      operationToid(col("sequence"), col("tx_pos") + 1, col("op_pos"))
        .as("history_operation_id"),
      when(col("atom.atom_type") === "liquidity_pool", 2).otherwise(1)
        .as("trade_type"),
      // rounding slippage (trade.go:350-399): recompute the constant-product
      // payout exactly from the PRE-state reserves; strict-receive uses the
      // disbursed amount, strict-send the deposited amount
      when(col("atom.atom_type") === "liquidity_pool" &&
          col("op_type").isin(PathPaymentTypes: _*),
        roundingSlippageUdf(
          lastPoolChange("pre_reserves_deposited"),
          lastPoolChange("pre_reserves_disbursed"),
          when(col("op_type") === 2, col("atom.amount_sold_stroops"))
            .otherwise(col("atom.amount_bought_stroops")),
          lastPoolChange("pre_pool_fee"),
          col("op_type") === 2)).as("rounding_slippage"),
      // strict-receive (2) → true, strict-send (13) → false
      // (`trade.go:225-255` sets sellerIsExact per result arm)
      when(col("op_type").isin(PathPaymentTypes: _*),
        col("op_type") === 2).as("seller_is_exact"),
      when(col("atom.atom_type") === "liquidity_pool",
        strkeyPool(col("atom.pool_id"))).as("selling_liquidity_pool_id_strkey"))
      // F7: zero-amount trades dropped (`trade.go:69-72`)
      .where(col("selling_amount") > 0 || col("buying_amount") > 0)
  }

  /** The reference's effect type ids/names (`schema.go:372-481`), subset
    * generated by this model. */
  val EffectNames: Map[Int, String] = Map(
    0 -> "account_created", 2 -> "account_credited", 3 -> "account_debited",
    12 -> "signer_updated", 33 -> "trade", 43 -> "sequence_bumped",
    20 -> "trustline_created", 21 -> "trustline_removed",
    22 -> "trustline_updated", 30 -> "offer_created", 31 -> "offer_removed",
    32 -> "offer_updated", 60 -> "account_sponsorship_created",
    62 -> "account_sponsorship_removed")

  /** Change-derived effects (`effects.go:287-368` sponsorship scan plus the
    * entry-CRUD families): effect type = f(entry_type, ledger_entry_change);
    * a created entry carrying a sponsor additionally emits the sponsorship
    * effect. One narrow projection + explode over a per-row effect array. */
  def changeEffects(changes: Dataset[graft.model.ChangeModel.ChangeRow]): DataFrame = {
    val crud = typedLit(Map(
      "trustline:0" -> 20, "trustline:2" -> 21, "trustline:1" -> 22,
      "offer:0" -> 30, "offer:2" -> 31, "offer:1" -> 32))
    val names = typedLit(EffectNames)
    val crudType = element_at(crud,
      concat(col("entry_type"), lit(":"), col("ledger_entry_change").cast("string")))
    val sponsorKey = coalesce(col("account.sponsor_key"), col("offer.sponsor_key"),
      col("trustline.sponsor_key"))
    val addressKey = coalesce(col("account.account_key"), col("offer.seller_key"),
      col("trustline.account_key"))

    val effectsArr = filter(array(
      when(crudType.isNotNull, struct(crudType.as("type"),
        element_at(names, crudType).as("type_string"))),
      when(sponsorKey.isNotNull && col("ledger_entry_change") === 0,
        struct(lit(60).as("type"), lit(EffectNames(60)).as("type_string"))),
      when(sponsorKey.isNotNull && col("ledger_entry_change") === 2,
        struct(lit(62).as("type"), lit(EffectNames(62)).as("type_string")))),
      e => e.isNotNull)

    changes.toDF()
      .where(addressKey.isNotNull)
      .select(
        strkeyAccount(addressKey).as("address"),
        col("ledger_sequence"), col("closed_at"), col("change_order"),
        posexplode(effectsArr).as(Seq("eff_pos", "e")))
      .select(
        col("address"),
        col("e.type").as("type"),
        col("e.type_string").as("type_string"),
        col("ledger_sequence"),
        col("closed_at"),
        concat(col("ledger_sequence").cast("string"), lit("-"),
          col("change_order").cast("string"), lit("-"),
          (col("eff_pos") + 1).cast("string")).as("id"))
  }

  /** P4 — `history_effects` over the model: per-op effect array built from
    * op type + claim atoms, exploded; id = "{opID}-{index}" (1-based). */
  def historyEffects(ledgers: Dataset[LedgerRow]): DataFrame = {
    val ops = opGrain(ledgers)

    def eff(t: Int, details: Column): Column =
      struct(lit(t).as("type"),
        lit(EffectNames(t)).as("type_string"),
        details.as("details"))

    val paymentDetails = concat(lit("""{"amount":""""),
      stroopsToXlm(col("op.amount_stroops")).cast("string"), lit(""""}"""))
    val tradeEffects = transform(col("op.claim_atoms"), a =>
      struct(lit(33).as("type"), lit("trade").as("type_string"),
        concat(lit("""{"sold":""""),
          a("amount_sold_stroops").cast("string"),
          lit("""","bought":""""),
          a("amount_bought_stroops").cast("string"), lit(""""}"""))
          .as("details")))

    val effectsArr =
      when(col("op.op_type") === 0, array(eff(0, paymentDetails)))
        .when(col("op.op_type") === 1,
          array(eff(2, paymentDetails), eff(3, paymentDetails)))
        .when(col("op.op_type") === 5, array(eff(12, lit("{}"))))
        .when(col("op.op_type") === 11, array(eff(43, lit("{}"))))
        .when(col("op.op_type").isin(TradeOpTypes: _*), tradeEffects)
        .otherwise(array().cast("array<struct<type:int,type_string:string,details:string>>"))

    ops
      .select(col("sequence"), col("closed_at"), col("tx_pos"),
        strkeyAccount(coalesce(col("op.source_key"), col("tx.source_key")))
          .as("address"),
        operationToid(col("sequence"), col("tx_pos") + 1, col("op_pos"))
          .as("operation_id"),
        posexplode(effectsArr).as(Seq("eff_pos", "e")))
      .select(
        col("address"),
        col("operation_id"),
        col("e.details").as("details"),
        col("e.type").as("type"),
        col("e.type_string").as("type_string"),
        col("closed_at"),
        col("sequence").as("ledger_sequence"),
        (col("eff_pos") + 1).cast("long").as("index"),
        concat(col("operation_id").cast("string"), lit("-"),
          (col("eff_pos") + 1).cast("string")).as("id"))
  }
}
