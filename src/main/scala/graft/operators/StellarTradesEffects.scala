package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.model.LedgerModel.{AssetRef, ClaimAtom, LedgerRow, OpChange, OpModel, TxModel}

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
      // path payments fall back to the synthetic op_id|bit62 id
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

  /** The reference's effect type ids/names (`schema.go:372-481`). */
  val EffectNames: Map[Int, String] = Map(
    0 -> "account_created", 1 -> "account_removed", 2 -> "account_credited",
    3 -> "account_debited", 4 -> "account_thresholds_updated",
    5 -> "account_home_domain_updated", 6 -> "account_flags_updated",
    7 -> "account_inflation_destination_updated",
    10 -> "signer_created", 11 -> "signer_removed", 12 -> "signer_updated",
    20 -> "trustline_created", 21 -> "trustline_removed",
    22 -> "trustline_updated", 26 -> "trustline_flags_updated",
    30 -> "offer_created", 31 -> "offer_removed", 32 -> "offer_updated",
    33 -> "trade", 40 -> "data_created", 41 -> "data_removed",
    42 -> "data_updated", 43 -> "sequence_bumped",
    50 -> "claimable_balance_created",
    51 -> "claimable_balance_claimant_created",
    52 -> "claimable_balance_claimed",
    60 -> "account_sponsorship_created", 61 -> "account_sponsorship_updated",
    62 -> "account_sponsorship_removed",
    63 -> "trustline_sponsorship_created",
    64 -> "trustline_sponsorship_updated",
    65 -> "trustline_sponsorship_removed",
    66 -> "data_sponsorship_created", 67 -> "data_sponsorship_updated",
    68 -> "data_sponsorship_removed",
    69 -> "claimable_balance_sponsorship_created",
    70 -> "claimable_balance_sponsorship_updated",
    71 -> "claimable_balance_sponsorship_removed",
    72 -> "signer_sponsorship_created", 73 -> "signer_sponsorship_updated",
    74 -> "signer_sponsorship_removed",
    80 -> "claimable_balance_clawed_back",
    90 -> "liquidity_pool_deposited", 91 -> "liquidity_pool_withdrew",
    92 -> "liquidity_pool_trade", 93 -> "liquidity_pool_created",
    94 -> "liquidity_pool_removed", 95 -> "liquidity_pool_revoked",
    96 -> "contract_credited", 97 -> "contract_debited",
    98 -> "extend_footprint_ttl", 99 -> "restore_footprint")

  /** Change-derived effects (`effects.go:287-368` sponsorship scan plus the
    * entry-CRUD families): CRUD effect type = f(entry_type,
    * ledger_entry_change); sponsorship effects classify on PRE/POST sponsor
    * presence (created / updated / removed / unchanged-skip), matching the
    * op-grain derivation in [[historyEffects]], with the sponsor addresses
    * in the details. One narrow projection + explode over a per-row effect
    * array. */
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
    // sponsorship effect family is per entry type (`effects.go:287-368`):
    // account 60-62, trustline 63-65; offer sponsorships emit no effect
    val sponsorBase = when(col("entry_type") === "account", 60)
      .when(col("entry_type") === "trustline", 63)
    // payload fields hold the post state only while the entry lives
    val postSp = when(!col("deleted") && sponsorKey.isNotNull,
      strkeyAccount(sponsorKey))
    val preSp = when(col("pre_sponsor_key").isNotNull,
      strkeyAccount(col("pre_sponsor_key")))
    def spObj(parts: Column*): Column =
      concat(lit("{"), concat_ws(",", parts: _*), lit("}"))
    def spKv(k: String, v: Column): Column =
      when(v.isNotNull, concat(lit("\"" + k + "\":\""), v, lit("\"")))

    val effectsArr = filter(array(
      when(crudType.isNotNull, struct(crudType.as("type"),
        element_at(names, crudType).as("type_string"),
        lit("{}").as("details"))),
      when(sponsorBase.isNotNull && preSp.isNull && postSp.isNotNull,
        struct(sponsorBase.as("type"),
          element_at(names, sponsorBase).as("type_string"),
          spObj(spKv("sponsor", postSp)).as("details")))
        .when(sponsorBase.isNotNull && preSp.isNotNull && postSp.isNull,
          struct((sponsorBase + 2).as("type"),
            element_at(names, sponsorBase + 2).as("type_string"),
            spObj(spKv("former_sponsor", preSp)).as("details")))
        .when(sponsorBase.isNotNull && preSp.isNotNull && postSp.isNotNull &&
            preSp =!= postSp,
          struct((sponsorBase + 1).as("type"),
            element_at(names, sponsorBase + 1).as("type_string"),
            spObj(spKv("new_sponsor", postSp),
              spKv("former_sponsor", preSp)).as("details")))),
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
        col("e.details").as("details"),
        col("ledger_sequence"),
        col("closed_at"),
        concat(col("ledger_sequence").cast("string"), lit("-"),
          col("change_order").cast("string"), lit("-"),
          (col("eff_pos") + 1).cast("string")).as("id"))
  }

  /** One effect element before numbering: type, subject address, details
    * JSON string (null address allowed — e.g. an LP atom's absent seller). */
  private final case class Eff(tpe: Int, address: String, details: String)

  /** One emitted history_effects row; `details` is the JSON string the
    * final projection parses into VARIANT. */
  final case class EffectRow(
      address: String, address_muxed: String, operation_id: Long,
      details: String, `type`: Int, type_string: String,
      closed_at: java.sql.Timestamp, ledger_sequence: Long,
      index: Long, id: String)

  /** P4 — `history_effects` over the model: per-op effect sequence built
    * from the op-type case law (`effects.go:74-135`);
    * id = "{opID}-{index}" (0-based, `operationEffects` tail numbering).
    * Each element carries its own subject address (`addMuxed`/`addUnmuxed`
    * target differs per effect). Soroban contract_credited/debited derive
    * from the op's SAC contract events; change-scan sponsorship transfers
    * are covered at change grain by [[changeEffects]].
    *
    * Implemented as ONE typed flatMap over the decoded rows, not a column
    * expression tree: the ~60-family fan-out compiled to a Catalyst tree so
    * large that ANALYSIS + optimization + per-task evaluation cost ~4s of
    * FIXED latency per job at any scale (measured: build 1.8s, optimize
    * 0.45s, execute 1.4s for 510 rows at sf0.1, all plan overhead — decode
    * itself 0.2s). The fan-out is intra-row with zero column reuse across
    * ops, so a deserialize→flatMap→serialize pipeline keeps the exact
    * semantics (the scalar helpers below mirror the codegen'd column
    * functions law-for-law, including `format_string`'s null→"null"
    * rendering) while the plan stays three nodes. Map-only either way: no
    * Exchange, embarrassingly parallel at any partition count. */
  def historyEffects(ledgers: Dataset[LedgerRow]): DataFrame = {
    import ledgers.sparkSession.implicits._
    val out = ledgers.flatMap { l =>
      l.transactions.iterator.zipWithIndex.filter(_._1.successful).flatMap {
        case (tx, txPos) =>
          tx.operations.iterator.zipWithIndex.flatMap { case (op, opPos) =>
            effectRows(l, tx, txPos, op, opPos)
          }
      }.toSeq
    }
    out.select(
      col("address"), col("address_muxed"), col("operation_id"),
      // reference `details` is a per-type map (`schema.go:360`); the
      // builders render it as a JSON string — VARIANT restores the
      // raw-object rendering on every output format
      parse_json(col("details")).as("details"),
      col("type"), col("type_string"), col("closed_at"),
      col("ledger_sequence"), col("index"), col("id"))
  }

  // ---- scalar mirrors of the column helpers --------------------------------
  // Each replicates the exact value law of the codegen'd column function it
  // replaces (GraftFunctions / functions._); null-propagation mirrors the
  // Column semantics (concat → null on any null arg; format_string renders a
  // null numeric as the four-char string "null"; kv skips null values).

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
  private def kv(k: String, v: String): String =
    if (v == null) null else "\"" + k + "\":\"" + esc(v) + "\""
  private def kvRaw(k: String, v: String): String =
    if (v == null) null else "\"" + k + "\":" + v
  private def obj(parts: String*): String =
    parts.filter(_ != null).mkString("{", ",", "}")

  /** `format_string("%.7f", stroopsToXlm(c))`: exact decimal quotient →
    * nearest double → fixed 7-decimal rendering (Locale.US half-up). */
  private def fmt7(stroops: Long): String =
    String.format(java.util.Locale.US, "%.7f", Double.box(
      new java.math.BigDecimal(stroops).movePointLeft(7).doubleValue))
  /** amt over a nullable column: a null input renders as the literal string
    * "null" (java.util.Formatter's null-argument law, which the column
    * version inherits through `format_string`). */
  private def amtO(v: Option[Long]): String = v.map(fmt7).getOrElse("null")

  private def hexLower(b: Array[Byte]): String =
    java.util.HexFormat.of().formatHex(b)
  private def b64s(b: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(b)
  private def strkeyG(k: Array[Byte]): String =
    graft.codec.Strkey.encodeAccountId(k)

  /** `assetCodeIssuer`: canonical "CODE:ISSUER" / "native", null-safe. */
  private def canonA(a: AssetRef): String =
    if (a == null) null
    else if (a.asset_type == "native") "native"
    else a.asset_code + ":" + a.asset_issuer
  /** `addAssetDetails` (operation.go:2001-2021). */
  private def assetKvs(a: AssetRef, prefix: String = ""): Seq[String] = Seq(
    kv(prefix + "asset_type", if (a == null) null else a.asset_type),
    kv(prefix + "asset_code",
      if (a != null && a.asset_type != "native") a.asset_code else null),
    kv(prefix + "asset_issuer",
      if (a != null && a.asset_type != "native") a.asset_issuer else null))

  private def lastPool(changes: Seq[OpChange],
      poolId: Option[Array[Byte]]): Option[OpChange] = poolId.flatMap(pid =>
    changes.reverseIterator.find(c => c.entry_type == "liquidity_pool" &&
      c.pool_id.exists(java.util.Arrays.equals(_, pid))))

  /** `liquidityPoolDetails` (effects.go:1249-1268) from a (possibly absent)
    * pool change: id/fee_bp/reserves drop out when unavailable; the type tag
    * is constant and total_shares always renders (the "null" fallback). */
  private def lpDetailsOf(chg: Option[OpChange]): String = obj(
    kv("id", chg.flatMap(_.pool_id).map(hexLower).orNull),
    kvRaw("fee_bp", chg.flatMap(_.pre_pool_fee).map(_.toString).orNull),
    kv("type", "constant_product"),
    // rendered as a STRING, matching the reference's strconv.FormatInt
    // (`liquidityPoolDetails`, effects.go:1253)
    kv("total_trustlines",
      chg.flatMap(_.post_trustline_count).map(_.toString).orNull),
    kv("total_shares", amtO(chg.flatMap(_.post_total_shares))),
    kvRaw("reserves", {
      val aA = chg.flatMap(_.pool_asset_a).map(canonA).orNull
      val aB = chg.flatMap(_.pool_asset_b).map(canonA).orNull
      if (aA == null || aB == null) null
      else "[{\"asset\":\"" + aA + "\",\"amount\":\"" +
        amtO(chg.flatMap(_.post_reserve_a)) + "\"},{\"asset\":\"" + aB +
        "\",\"amount\":\"" + amtO(chg.flatMap(_.post_reserve_b)) + "\"}]"
    }))

  /** The per-op effect fan-out: op-family effects, then the change-derived
    * sponsorship families (effects.go:141-151), then the LP entry loop
    * (effects.go:373-402) — numbered 0-based in emit order. */
  private def effectRows(l: LedgerRow, tx: TxModel, txPos: Int,
      op: OpModel, opPos: Int): Seq[EffectRow] = {
    val sourceAddr = strkeyG(op.source_key.getOrElse(tx.source_key))
    val destAddr = op.destination_key.map(strkeyG).orNull
    // the acting source's muxed identity (M-address, id): the reference's
    // operation.SourceAccount() is the OP-level muxed account when the op's
    // own source is an M-address, else the tx-level one — the trade
    // seller-details label their buyer counterparty "seller" and append
    // seller_muxed / seller_muxed_id
    // (`addAccountAndMuxedAccountDetails`, operation.go:423-438)
    val sourceMuxed: Option[(String, Long)] =
      if (op.source_key.isDefined && op.source_muxed_id.isDefined)
        Some((graft.codec.Strkey.encodeMuxed(op.source_key.get,
          op.source_muxed_id.get), op.source_muxed_id.get))
      else if (op.source_key.isEmpty && tx.source_muxed_id.isDefined)
        Some((graft.codec.Strkey.encodeMuxed(tx.source_key,
          tx.source_muxed_id.get), tx.source_muxed_id.get))
      else None
    val amount = fmt7(op.amount_stroops)
    val opAsset = op.asset.orNull
    val cbId = op.balance_id.map(b => "00000000" + hexLower(b)).orNull
    val cbAmt = amtO(op.cb_amount_stroops)
    val cbAsset = canonA(op.cb_asset.orNull)

    // account family -------------------------------------------------------
    def createAccount = Seq(
      Eff(0, destAddr, obj(kv("starting_balance",
        amtO(op.starting_balance_stroops)))),
      Eff(3, sourceAddr, obj(
        kv("amount", amtO(op.starting_balance_stroops)),
        kv("asset_type", "native"))),
      Eff(10, destAddr, obj(kv("public_key", destAddr), kvRaw("weight", "1"))))
    def payment = Seq(
      Eff(2, destAddr, obj(kv("amount", amount) +: assetKvs(opAsset): _*)),
      Eff(3, sourceAddr, obj(kv("amount", amount) +: assetKvs(opAsset): _*)))
    def pathPayment = Seq(
      Eff(2, destAddr, obj(kv("amount", amount) +: assetKvs(opAsset): _*)),
      Eff(3, sourceAddr, obj(
        kv("amount", amtO(op.source_amount_stroops)) +:
          assetKvs(op.source_asset.orNull): _*)))
    def accountMerge = Seq(
      Eff(3, sourceAddr, obj(kv("amount", amount), kv("asset_type", "native"))),
      Eff(2, destAddr, obj(kv("amount", amount), kv("asset_type", "native"))),
      Eff(1, sourceAddr, "{}"))
    // inflation: one account_credited per result payout (`effects.go:745-755`)
    def inflation = op.inflation_payouts.map(p =>
      Eff(2, strkeyG(p.destination_key), obj(
        kv("amount", fmt7(p.amount_stroops)), kv("asset_type", "native"))))

    // set_options: one effect per touched option (`effects.go:498-588`)
    def setOptions: Seq[Eff] = {
      val b = Seq.newBuilder[Eff]
      if (op.low_threshold.isDefined || op.med_threshold.isDefined ||
          op.high_threshold.isDefined)
        b += Eff(4, sourceAddr, obj(
          kvRaw("low_threshold", op.low_threshold.map(_.toString).orNull),
          kvRaw("med_threshold", op.med_threshold.map(_.toString).orNull),
          kvRaw("high_threshold", op.high_threshold.map(_.toString).orNull)))
      if (op.home_domain.isDefined)
        b += Eff(5, sourceAddr, obj(kv("home_domain", op.home_domain.get)))
      if (op.set_flags.isDefined || op.clear_flags.isDefined)
        b += Eff(6, sourceAddr, obj(Seq(
          1 -> "auth_required_flag", 2 -> "auth_revocable_flag",
          4 -> "auth_immutable_flag", 8 -> "auth_clawback_enabled_flag")
          .map { case (bit, key) => // all four arms, `effects.go:1211-1224`
            kvRaw(key,
              if (op.set_flags.exists(f => (f & bit) != 0)) "true"
              else if (op.clear_flags.exists(f => (f & bit) != 0)) "false"
              else null)
          }: _*))
      if (op.inflation_dest_key.isDefined)
        b += Eff(7, sourceAddr, obj(kv("inflation_destination",
          strkeyG(op.inflation_dest_key.get))))
      op.signer_key.foreach { sk =>
        if (op.signer_weight.contains(0))
          b += Eff(11, sourceAddr, obj(kv("public_key", strkeyG(sk))))
        else
          b += Eff(10, sourceAddr, obj(kv("public_key", strkeyG(sk)),
            kvRaw("weight", op.signer_weight.map(_.toString).orNull)))
      }
      b.result()
    }

    // trust lines ----------------------------------------------------------
    // pool-share lines carry the `addLiquidityPoolAssetDetails` triple
    // (operation.go:389-407); classic lines the plain asset details
    val trustAssetKvs =
      if (op.trust_asset.isEmpty && op.trust_pool_id.isDefined) Seq(
        kv("asset_type", "liquidity_pool_shares"),
        kv("liquidity_pool_id", op.trust_pool_id.map(hexLower).orNull),
        kv("liquidity_pool_id_strkey", op.trust_pool_id
          .map(graft.codec.Strkey.encodeLiquidityPool).orNull))
      else assetKvs(op.trust_asset.orNull) :+
        kv("liquidity_pool_id", op.trust_pool_id.map(hexLower).orNull)
    // created/updated/removed from the op's trustline ledger-entry change
    // whose asset type matches the op line (`addChangeTrustEffects`,
    // effects.go:637-695); limit-only heuristic as fallback when the model
    // carries no change entry
    def changeTrust: Seq[Eff] = {
      val lineType = op.trust_asset.map(_.asset_type).getOrElse("pool_share")
      val tlCh = op.changes.reverseIterator.find(c =>
        c.entry_type == "trustline" && c.tl_asset_type.contains(lineType))
      val t = tlCh.flatMap(_.change_kind) match {
        case Some(0) => 20
        case Some(2) => 21
        case Some(1) => 22
        case _ => if (op.trust_limit_stroops.exists(_ > 0)) 20 else 21
      }
      Seq(Eff(t, sourceAddr, obj(
        kv("limit", amtO(op.trust_limit_stroops)) +: trustAssetKvs: _*)))
    }
    // set_trust_line_flags (21): ONE effect; each flag renders true when
    // present in set-flags and false when in clear-flags, clear winning on
    // overlap (`setTrustLineFlagDetails` applied set-then-clear,
    // effects.go:1124-1134)
    val trustorKvs = kv("trustor", op.trustor_key.map(strkeyG).orNull) +:
      assetKvs(op.trust_asset.orNull)
    def tlFlagsUpdated = Seq(
      Eff(26, sourceAddr, obj(trustorKvs ++ Seq(
          1 -> "authorized_flag",
          2 -> "authorized_to_maintain_liabilites", // sic, `effects.go:1129`
          4 -> "clawback_enabled_flag").map { case (bit, key) =>
            kvRaw(key,
              if (op.tl_clear_flags.exists(f => (f & bit) != 0)) "false"
              else if (op.tl_set_flags.exists(f => (f & bit) != 0)) "true"
              else null)
          }: _*)))
    // allow_trust (7): TWO effects — the legacy flags-free details, then the
    // forward-compatibility flag rendering (`addAllowTrustEffects`,
    // effects.go:696-728): authorized → authorized_flag:true only;
    // maintain-liabilities → its flag true only; anything else clears both
    def allowTrust = {
      val af = op.authorize_flags.getOrElse(0)
      Seq(
        Eff(26, sourceAddr, obj(trustorKvs: _*)),
        Eff(26, sourceAddr, obj(trustorKvs ++ Seq(
          kvRaw("authorized_flag",
            if ((af & 1) != 0) "true"
            else if ((af & 2) == 0) "false" else null),
          kvRaw("authorized_to_maintain_liabilites",
            if ((af & 1) != 0) null
            else if ((af & 2) != 0) "true" else "false")): _*)))
    }

    // data / sequence ------------------------------------------------------
    // created vs updated classifies on the op's DATA entry change kind
    // (`addManageDataEffects` wraps the ledger-entry change); value nil is
    // always a removal, and absent change info falls back to created
    def manageData: Seq[Eff] = op.data_value match {
      case Some(v) =>
        val updated = op.changes.reverseIterator
          .find(c => c.entry_type == "data" && c.change_kind.isDefined)
          .exists(_.change_kind.contains(1))
        Seq(Eff(if (updated) 42 else 40, sourceAddr, obj(
          kv("name", op.data_name.orNull), kv("value", b64s(v)))))
      case None =>
        Seq(Eff(41, sourceAddr, obj(kv("name", op.data_name.orNull))))
    }
    def bumpSequence = Seq(Eff(43, sourceAddr,
      obj(kv("new_seq", op.bump_to.map(_.toString).orNull))))

    // claimable balances ---------------------------------------------------
    // the created/removed CB entry's clawback flag surfaces ONLY when set
    // (`setClaimableBalanceFlagDetails`, effects.go:826-831); created
    // entries carry it directly, claimed ones via the paired STATE entry
    def cbClawbackFlag(kind: Int): String =
      if (op.changes.exists(c => c.entry_type == "claimable_balance" &&
          c.change_kind.contains(kind) &&
          c.cb_clawback_enabled.contains(true))) "true"
      else null
    def createCb =
      Seq(Eff(50, sourceAddr, obj(
        kv("balance_id", cbId), kv("amount", cbAmt), kv("asset", cbAsset),
        kvRaw("claimable_balance_clawback_enabled_flag",
          cbClawbackFlag(0))))) ++
      op.claimants.map(c =>
        Eff(51, strkeyG(c.destination_key), obj(
          kv("balance_id", cbId), kv("amount", cbAmt),
          kvRaw("predicate",
            graft.codec.ClaimPredicate.jsonFromBinary(c.predicate_xdr)),
          kv("asset", cbAsset)))) ++
      Seq(Eff(3, sourceAddr,
        obj(kv("amount", cbAmt) +: assetKvs(op.cb_asset.orNull): _*)))
    def claimCb = Seq(
      Eff(52, sourceAddr, obj(
        kv("amount", cbAmt), kv("balance_id", cbId), kv("asset", cbAsset),
        kvRaw("claimable_balance_clawback_enabled_flag",
          cbClawbackFlag(2)))),
      Eff(2, sourceAddr,
        obj(kv("amount", cbAmt) +: assetKvs(op.cb_asset.orNull): _*)))
    def clawback = Seq(
      Eff(2, sourceAddr, obj(kv("amount", amount) +: assetKvs(opAsset): _*)),
      Eff(3, destAddr, obj(kv("amount", amount) +: assetKvs(opAsset): _*)))
    def clawbackCb = Seq(
      Eff(80, sourceAddr, obj(kv("balance_id", cbId))),
      Eff(2, sourceAddr,
        obj(kv("amount", cbAmt) +: assetKvs(op.cb_asset.orNull): _*)))

    // trades ---------------------------------------------------------------
    // offer atoms: the reference emits trade AND offer_updated/removed/
    // created for BOTH buyer and seller per claim (`addClaimTradeEffects`,
    // effects.go:986-1010), skipping offer_created on path payments;
    // LP atoms: one liquidity_pool_trade addressed to the op source
    def tradeDetails(a: ClaimAtom, mineIsBought: Boolean,
        counterparty: String): String = {
      val (soldAmt, soldAsset, boughtAmt, boughtAsset) =
        if (mineIsBought)
          (a.amount_bought_stroops, a.asset_bought,
            a.amount_sold_stroops, a.asset_sold)
        else
          (a.amount_sold_stroops, a.asset_sold,
            a.amount_bought_stroops, a.asset_bought)
      obj(Seq(
        kv("seller", counterparty)) ++
        // seller-side details: the "seller" label holds the BUYER (the
        // reference's long-standing quirk) with muxed variants when the
        // buyer acted in muxed form; buyer-side details face a bare
        // AccountId seller, so no muxed keys (tradeDetails,
        // effects.go:1226-1246)
        (if (!mineIsBought) Seq(
          kv("seller_muxed", sourceMuxed.map(_._1).orNull),
          kvRaw("seller_muxed_id", sourceMuxed.map(_._2.toString).orNull))
        else Nil) ++ Seq(
        kvRaw("offer_id", a.offer_id.map(_.toString).orNull),
        kv("sold_amount", fmt7(soldAmt))) ++
        assetKvs(soldAsset, "sold_") ++ Seq(
        kv("bought_amount", fmt7(boughtAmt))) ++
        assetKvs(boughtAsset, "bought_"): _*)
    }
    // atoms where both amounts are zero emit nothing
    // (`addIngestTradeEffects`, effects.go:966-971)
    def atomTradeEffects(isPathPayment: Boolean): Seq[Eff] =
      op.claim_atoms.filter(a =>
        a.amount_sold_stroops != 0 || a.amount_bought_stroops != 0).flatMap { a =>
        if (a.atom_type == "liquidity_pool") {
          def side(asset: AssetRef, amt: Long): String = {
            val c = canonA(asset)
            if (c == null) null
            else "{\"asset\":\"" + c + "\",\"amount\":\"" + fmt7(amt) + "\"}"
          }
          Seq(Eff(92, sourceAddr, obj(
            // nested `liquidity_pool` details object
            // (`addClaimLiquidityPoolTradeEffect`, effects.go:1014-1032);
            // partial width — the atom's pool change carries no post state
            kvRaw("liquidity_pool", obj(
              kv("id", a.pool_id.map(hexLower).orNull),
              kvRaw("fee_bp", lastPool(op.changes, a.pool_id)
                .flatMap(_.pre_pool_fee).map(_.toString).orNull),
              kv("type", "constant_product"))),
            kvRaw("sold", side(a.asset_sold, a.amount_sold_stroops)),
            kvRaw("bought", side(a.asset_bought, a.amount_bought_stroops)))))
        } else {
          val sellerAddr = a.seller_key.map(strkeyG).orNull
          // buyer view bought what the atom sold, and vice versa
          val bd = tradeDetails(a, mineIsBought = true, sellerAddr)
          val sd = tradeDetails(a, mineIsBought = false, sourceAddr)
          val types = if (isPathPayment) Seq(33, 32, 31) else Seq(33, 32, 31, 30)
          types.flatMap(t => Seq(Eff(t, sourceAddr, bd), Eff(t, sellerAddr, sd)))
        }
      }
    def tradeEffects = atomTradeEffects(isPathPayment = false)
    // only strict-SEND skips offer_created: strict-receive calls
    // addIngestTradeEffects with isPathPayment=false (`effects.go:471` vs
    // `:488`) — the real 10_ledgers effects golden shows created pairs on a
    // successful strict-receive
    def pathPaymentTrades =
      pathPayment ++ atomTradeEffects(isPathPayment = false)
    def pathPaymentSendTrades =
      pathPayment ++ atomTradeEffects(isPathPayment = true)

    // liquidity pools ------------------------------------------------------
    lazy val lpChange = lastPool(op.changes, op.pool_id)
    def lpReservesDelta(negate: Boolean): String = {
      def delta(pre: Option[Long], post: Option[Long]): Option[Long] =
        for (p <- pre; q <- post) yield if (negate) p - q else q - p
      val aA = lpChange.flatMap(_.pool_asset_a).map(canonA).orNull
      val aB = lpChange.flatMap(_.pool_asset_b).map(canonA).orNull
      if (aA == null || aB == null) null
      else "[{\"asset\":\"" + aA + "\",\"amount\":\"" +
        amtO(delta(lpChange.flatMap(_.pre_reserve_a),
          lpChange.flatMap(_.post_reserve_a))) +
        "\"},{\"asset\":\"" + aB + "\",\"amount\":\"" +
        amtO(delta(lpChange.flatMap(_.pre_reserve_b),
          lpChange.flatMap(_.post_reserve_b))) + "\"}]"
    }
    def sharesDelta(negate: Boolean): String = amtO(
      for {
        c <- lpChange; p <- c.pre_total_shares; q <- c.post_total_shares
      } yield if (negate) p - q else q - p)
    def lpDeposit = Seq(Eff(90, sourceAddr, obj(
      kvRaw("liquidity_pool", lpDetailsOf(lpChange)),
      kvRaw("reserves_deposited", lpReservesDelta(negate = false)),
      kv("shares_received", sharesDelta(negate = false)))))
    def lpWithdraw = Seq(Eff(91, sourceAddr, obj(
      kvRaw("liquidity_pool", lpDetailsOf(lpChange)),
      kvRaw("reserves_received", lpReservesDelta(negate = true)),
      kv("shares_redeemed", sharesDelta(negate = true)))))

    // LP-share revocation (`addLiquidityPoolRevokedEffect`,
    // effects.go:1160-1224), appended to allow_trust/set_trust_line_flags:
    // when the op's changes carry an LP product delta AND created claimable
    // balances, emit CB-created effects (50 + claimant 51s) per balance,
    // then one liquidity_pool_revoked (95) whose reserves_revoked lists the
    // reserve assets matched to their reclaiming balance.
    // core's CB metadata order is unspecified, so the reference sorts the
    // created balances by asset before emitting (`sort.Sort(cbs)`,
    // effects.go:1139,1176: XDR Asset ordering = type, then code, then
    // issuer) — a (type-rank, code, issuer) sort key keeps effect indices
    // matched with ≥2 created CBs
    def revocation: Seq[Eff] = {
      def rank(a: AssetRef): Int = a.asset_type match {
        case "native" => 0
        case "credit_alphanum4" => 1
        case _ => 2
      }
      val revCbs = op.changes.filter(_.cb_revocation.isDefined)
        .sortBy { ch =>
          val a = ch.cb_revocation.get.asset
          (rank(a), Option(a.asset_code).getOrElse(""),
            Option(a.asset_issuer).getOrElse(""))
        }
      val revPool = op.changes.reverseIterator.find(c =>
        c.entry_type == "liquidity_pool" && c.pre_reserve_a.isDefined)
      if (revPool.isEmpty || revCbs.isEmpty) Nil
      else {
        def cbIdOf(b: Array[Byte]): String = "00000000" + hexLower(b)
        val created = revCbs.flatMap { ch =>
          val r = ch.cb_revocation.get
          Seq(
            Eff(50, sourceAddr, obj(
              kv("balance_id", cbIdOf(r.balance_id)),
              kv("amount", fmt7(r.amount_stroops)),
              kv("asset", canonA(r.asset)))),
            Eff(51, strkeyG(r.claimant_key), obj(
              kv("balance_id", cbIdOf(r.balance_id)),
              kv("amount", fmt7(r.amount_stroops)),
              kvRaw("predicate", graft.codec.ClaimPredicate
                .jsonFromBinary(r.claimant_predicate_xdr)),
              kv("asset", canonA(r.asset)))))
        }
        def revEntry(asset: Option[AssetRef], pre: Option[Long],
            post: Option[Long]): String = {
          val c = asset.map(canonA).orNull
          val matched = revCbs.find(ch =>
            canonA(ch.cb_revocation.get.asset) == c)
          if (matched.isEmpty || c == null) null
          else "{\"asset\":\"" + c + "\",\"amount\":\"" +
            amtO(for (p <- pre; q <- post) yield p - q) +
            "\",\"claimable_balance_id\":\"" +
            cbIdOf(matched.get.cb_revocation.get.balance_id) + "\"}"
        }
        val rp = revPool.get
        created :+ Eff(95, sourceAddr, obj(
          kvRaw("liquidity_pool", lpDetailsOf(revPool)),
          kvRaw("reserves_revoked", "[" + Seq(
            revEntry(rp.pool_asset_a, rp.pre_reserve_a, rp.post_reserve_a),
            revEntry(rp.pool_asset_b, rp.pre_reserve_b, rp.post_reserve_b))
            .filter(_ != null).mkString(",") + "]"),
          kv("shares_revoked", amtO(
            for (p <- rp.pre_total_shares; q <- rp.post_total_shares)
              yield p - q))))
      }
    }

    // soroban --------------------------------------------------------------
    // affected entries render as base64 XDR TTL ledger keys
    // (discriminant LEDGER_ENTRY_TYPE_TTL = 9 ‖ 32-byte key hash), from the
    // op's TTL entry changes; non-TTL changes are ignored
    // (`addExtendFootprintTtlEffect`/`addRestoreFootprintExpirationEffect`,
    // effects.go:1434-1513)
    def ttlEntriesJson: String =
      op.changes.flatMap(_.ttl_key_hash)
        .map(h => "\"" + b64s(Array[Byte](0, 0, 0, 9) ++ h) + "\"")
        .mkString("[", ",", "]")
    def extendTtl = Seq(Eff(98, sourceAddr, obj(
      kvRaw("entries", ttlEntriesJson),
      kvRaw("extend_to", op.extend_to.map(_.toString).orNull))))
    def restoreFootprint = Seq(Eff(99, sourceAddr,
      obj(kvRaw("entries", ttlEntriesJson))))

    // invoke-host-function: credit/debit effects from SAC events
    // (`addInvokeHostFunctionEffects`, effects.go:1319-1430) — account
    // parties (G…) get account_credited/debited addressed to themselves;
    // contract parties (C…) get contract_credited/debited addressed to the
    // OP SOURCE with the C-address in a `contract` detail key; every SAC
    // detail map carries `contract_event_type`; mint credits only,
    // burn/clawback debit only
    def invokeEffects: Seq[Eff] =
      op.sac_events.iterator
        .flatMap(e => graft.codec.SacEvents.parse(e.topics_xdr, e.data_xdr))
        .flatMap { e =>
          val amountStr = e.amountString
          // amount.String128 scaling: decimal(38,7) holds all but the last
          // digit of the i128 range; 39-digit outliers keep the raw integer
          // string (mirrors the column cast chain, incl. BigDecimal's
          // scientific toString on sub-1e-6 magnitudes)
          val scaled =
            if (amountStr.length <= 31)
              new java.math.BigDecimal(amountStr).movePointLeft(7)
                .setScale(7, java.math.RoundingMode.HALF_UP).toString
            else amountStr
          val baseKvs = Seq(
            kv("amount", scaled),
            kv("asset_type", e.assetType),
            kv("asset_code", if (e.assetType == "native") null else e.code),
            kv("asset_issuer", if (e.assetType == "native") null else e.issuer),
            kv("contract_event_type", e.eventType))
          val accDetails = obj(baseKvs: _*)
          def contractDetails(cAddr: String) =
            obj(baseKvs :+ kv("contract", cAddr): _*)
          e.from.map { f =>
            if (f.startsWith("C")) Eff(97, sourceAddr, contractDetails(f))
            else Eff(3, f, accDetails)
          }.toSeq ++
          e.to.map { t =>
            if (t.startsWith("C")) Eff(96, sourceAddr, contractDetails(t))
            else Eff(2, t, accDetails)
          }.toSeq
        }.toSeq

    // sponsorship families (60-74): change-derived, appended AFTER the
    // op-specific effects for EVERY op type — the reference iterates the
    // op's changes emitting the entry-sponsorship effect then any
    // signer-sponsorship effects per change (effects.go:141-151).
    // created/updated/removed classify on pre/post sponsor presence, not on
    // the entry change kind (effects.go:296-317); same-sponsor transitions
    // emit nothing. Account/trustline effects address the entry's owning
    // account; data/claimable-balance effects address the op source.
    val spBase = Map("account" -> 60, "trustline" -> 63,
      "data" -> 66, "claimable_balance" -> 69)
    def sponsorshipEffects: Seq[Eff] = op.changes.flatMap { c =>
      c.sponsorship.toSeq.flatMap { sp =>
        val base = spBase.get(c.entry_type)
        val preSp = sp.pre_sponsor_key.map(strkeyG).orNull
        val postSp = sp.post_sponsor_key.map(strkeyG).orNull
        val addr = sp.subject_key.map(strkeyG).getOrElse(sourceAddr)
        // per-entry-type detail extras (`effects.go:331-352`): trustline
        // asset (canonical, or pool-share id), data name, CB balance id
        val extras = Seq(
          kv("asset", sp.tl_asset.map(canonA).orNull),
          kv("asset_type",
            if (sp.tl_pool_id.isDefined) "liquidity_pool" else null),
          kv("liquidity_pool_id", sp.tl_pool_id.map(hexLower).orNull),
          kv("data_name", sp.data_name.orNull),
          kv("balance_id",
            sp.cb_id.map(b => "00000000" + hexLower(b)).orNull))
        val entryEff: Seq[Eff] = base match {
          case Some(bse) if preSp == null && postSp != null =>
            Seq(Eff(bse, addr, obj(kv("sponsor", postSp) +: extras: _*)))
          case Some(bse) if preSp != null && postSp == null =>
            Seq(Eff(bse + 2, addr,
              obj(kv("former_sponsor", preSp) +: extras: _*)))
          case Some(bse) if preSp != null && postSp != null && preSp != postSp =>
            Seq(Eff(bse + 1, addr, obj(Seq(kv("new_sponsor", postSp),
              kv("former_sponsor", preSp)) ++ extras: _*)))
          case _ => Nil
        }
        // signer sponsorships (account entries): diff the pre/post
        // signer→sponsor maps, emitting per signer in strkey order
        // (effects.go:225-285)
        val preM = sp.pre_signer_sponsors
          .map(s => strkeyG(s.signer_key) -> strkeyG(s.sponsor_key)).toMap
        val postM = sp.post_signer_sponsors
          .map(s => strkeyG(s.signer_key) -> strkeyG(s.sponsor_key)).toMap
        val signerEffs = (preM.keySet ++ postM.keySet).toSeq.sorted.flatMap {
          k => (preM.get(k), postM.get(k)) match {
            case (None, Some(nv)) =>
              Seq(Eff(72, addr, obj(kv("sponsor", nv), kv("signer", k))))
            case (Some(pv), None) =>
              Seq(Eff(74, addr, obj(kv("former_sponsor", pv), kv("signer", k))))
            case (Some(pv), Some(nv)) if pv != nv =>
              Seq(Eff(73, addr, obj(kv("former_sponsor", pv),
                kv("new_sponsor", nv), kv("signer", k))))
            case _ => Nil
          }
        }
        entryEff ++ signerEffs
      }
    }

    val effectsArr: Seq[Eff] = op.op_type match {
      case 0 => createAccount
      case 1 => payment
      case 2 => pathPaymentTrades
      case 13 => pathPaymentSendTrades
      case 3 | 4 | 12 => tradeEffects
      case 5 => setOptions
      case 6 => changeTrust
      case 7 => allowTrust ++ revocation
      case 21 => tlFlagsUpdated ++ revocation
      case 8 => accountMerge
      case 9 => inflation
      case 10 => manageData
      case 11 => bumpSequence
      case 14 => createCb
      case 15 => claimCb
      case 19 => clawback
      case 20 => clawbackCb
      case 22 => lpDeposit
      case 23 => lpWithdraw
      case 24 => invokeEffects
      case 25 => extendTtl
      case 26 => restoreFootprint
      case _ => Nil
    }

    // LP entry-change loop (`addLedgerEntryLiquidityPoolEffects`,
    // effects.go:373-402), after the sponsorship loop: created pool entries
    // emit 93 with full pool details, removed ones 94 with the id; updates
    // (and the kind-less LP deltas of deposit/withdraw/revocation) emit
    // nothing. Addressed to the op source.
    val lpEntryEffects: Seq[Eff] = op.changes.flatMap { c =>
      if (c.entry_type == "liquidity_pool" && c.change_kind.contains(0))
        Seq(Eff(93, sourceAddr,
          obj(kvRaw("liquidity_pool", lpDetailsOf(Some(c))))))
      else if (c.entry_type == "liquidity_pool" && c.change_kind.contains(2))
        Seq(Eff(94, sourceAddr,
          obj(kv("liquidity_pool_id", c.pool_id.map(hexLower).orNull))))
      else Nil
    }

    val allEffects = effectsArr ++ sponsorshipEffects ++ lpEntryEffects

    val opId = graft.codec.Toid.operationId(l.sequence, txPos + 1L, opPos + 1L)
    // `addMuxed` (effects.go:173-194): when the acting participant was
    // addressed in muxed form, `address` is the unmuxed G-account and
    // `address_muxed` the M-address. Muxing can ride on the op's OWN source
    // (source_muxed_id alongside an explicit source_key — the reference's
    // operation.SourceAccount()), the tx source, or the op destination
    // (destination_muxed_id); every other addressee goes through
    // `addUnmuxed` ⇒ null.
    def muxedOf(addr: String): String =
      if (addr != null && destAddr != null && addr == destAddr &&
          op.destination_muxed_id.isDefined)
        graft.codec.Strkey.encodeMuxed(op.destination_key.get,
          op.destination_muxed_id.get)
      else if (addr != null && addr == sourceAddr && op.source_key.isDefined &&
          op.source_muxed_id.isDefined)
        graft.codec.Strkey.encodeMuxed(op.source_key.get, op.source_muxed_id.get)
      else if (addr != null && addr == sourceAddr && op.source_key.isEmpty &&
          tx.source_muxed_id.isDefined)
        graft.codec.Strkey.encodeMuxed(tx.source_key, tx.source_muxed_id.get)
      else null

    allEffects.zipWithIndex.map { case (e, i) =>
      EffectRow(
        address = e.address,
        address_muxed = muxedOf(e.address),
        operation_id = opId,
        details = e.details,
        `type` = e.tpe,
        type_string = EffectNames(e.tpe),
        closed_at = l.closed_at,
        ledger_sequence = l.sequence,
        index = i.toLong,
        id = s"$opId-$i")
    }
  }
}
