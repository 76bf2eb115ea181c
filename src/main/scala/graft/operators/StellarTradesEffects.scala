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

  /** P4 — `history_effects` over the model: per-op effect array built from
    * the op-type case law (`effects.go:74-135`), exploded;
    * id = "{opID}-{index}" (0-based, `operationEffects` tail numbering).
    * Each element carries its own subject
    * address (`addMuxed`/`addUnmuxed` target differs per effect). All
    * intra-row column algebra: the per-type arrays concat, nulls filter out,
    * one posexplode. Soroban contract_credited/debited derive from the op's
    * SAC contract events; change-scan sponsorship transfers are covered at
    * change grain by [[changeEffects]]. */
  def historyEffects(ledgers: Dataset[LedgerRow]): DataFrame = {
    val ops = opGrain(ledgers)
    val ty = col("op.op_type")
    val sourceAddr = strkeyAccount(coalesce(col("op.source_key"), col("tx.source_key")))
    val destAddr = when(col("op.destination_key").isNotNull,
      strkeyAccount(col("op.destination_key")))

    val effType = "struct<address:string,type:int,type_string:string,details:string>"
    val noEff = array().cast(s"array<$effType>")

    val names = typedLit(EffectNames)
    def eff(t: Int, addr: Column, details: Column): Column =
      struct(addr.as("address"), lit(t).as("type"),
        lit(EffectNames(t)).as("type_string"), details.as("details"))
    // variant for effect types only known at runtime (change-derived)
    def effC(typeCol: Column, addr: Column, details: Column): Column =
      struct(addr.as("address"), typeCol.as("type"),
        element_at(names, typeCol).as("type_string"), details.as("details"))

    // details builders: conditional keys drop out via concat_ws null-skip
    def obj(parts: Column*): Column =
      concat(lit("{"), concat_ws(",", parts: _*), lit("}"))
    // JSON string escape for data-carried values (home domains, data names):
    // backslash first, then quote — the two JSON-breaking characters
    def escJson(v: Column): Column =
      regexp_replace(regexp_replace(v, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
    def kv(k: String, v: Column): Column =
      when(v.isNotNull, concat(lit("\"" + k + "\":\""), escJson(v), lit("\"")))
    def kvRaw(k: String, v: Column): Column =
      when(v.isNotNull, concat(lit("\"" + k + "\":"), v))
    // `amount.String`: 7-decimal fixed-point rendering of stroops
    def amt(c: Column): Column = format_string("%.7f", stroopsToXlm(c))
    def canon(a: Column): Column = assetCodeIssuer(a)
    // `addAssetDetails` (operation.go:2001-2021): {prefix}asset_type always,
    // code/issuer only for non-native
    def assetKvs(a: Column, prefix: String = ""): Seq[Column] = Seq(
      kv(prefix + "asset_type", a("asset_type")),
      kv(prefix + "asset_code", when(a("asset_type") =!= "native", a("asset_code"))),
      kv(prefix + "asset_issuer", when(a("asset_type") =!= "native", a("asset_issuer"))))

    val amount = amt(col("op.amount_stroops"))
    val opAsset = col("op.asset")
    val cbId = concat(lit("00000000"), lower(hex(col("op.balance_id"))))
    val cbAmt = amt(col("op.cb_amount_stroops"))
    val cbAsset = canon(col("op.cb_asset"))

    // account family -------------------------------------------------------
    val createAccount = array(
      eff(0, destAddr, obj(kv("starting_balance",
        amt(col("op.starting_balance_stroops"))))),
      eff(3, sourceAddr, obj(
        kv("amount", amt(col("op.starting_balance_stroops"))),
        kv("asset_type", lit("native")))),
      eff(10, destAddr, obj(kv("public_key", destAddr),
        kvRaw("weight", lit(1)))))
    val payment = array(
      eff(2, destAddr, obj(kv("amount", amount) +: assetKvs(opAsset): _*)),
      eff(3, sourceAddr, obj(kv("amount", amount) +: assetKvs(opAsset): _*)))
    val pathPayment = array(
      eff(2, destAddr, obj(kv("amount", amount) +: assetKvs(opAsset): _*)),
      eff(3, sourceAddr, obj(
        kv("amount", amt(col("op.source_amount_stroops"))) +:
          assetKvs(col("op.source_asset")): _*)))
    val accountMerge = array(
      eff(3, sourceAddr, obj(kv("amount", amount), kv("asset_type", lit("native")))),
      eff(2, destAddr, obj(kv("amount", amount), kv("asset_type", lit("native")))),
      eff(1, sourceAddr, lit("{}")))
    // inflation: one account_credited per result payout (`effects.go:745-755`)
    val inflation = transform(col("op.inflation_payouts"), p =>
      eff(2, strkeyAccount(p("destination_key")), obj(
        kv("amount", amt(p("amount_stroops"))),
        kv("asset_type", lit("native")))))

    // set_options: one effect per touched option (`effects.go:498-588`)
    val setOptions = filter(array(
      when(col("op.low_threshold").isNotNull ||
          col("op.med_threshold").isNotNull || col("op.high_threshold").isNotNull,
        eff(4, sourceAddr, obj(
          kvRaw("low_threshold", col("op.low_threshold")),
          kvRaw("med_threshold", col("op.med_threshold")),
          kvRaw("high_threshold", col("op.high_threshold"))))),
      when(col("op.home_domain").isNotNull,
        eff(5, sourceAddr, obj(kv("home_domain", col("op.home_domain"))))),
      when(col("op.set_flags").isNotNull || col("op.clear_flags").isNotNull,
        eff(6, sourceAddr, obj(Seq(
          1 -> "auth_required_flag", 2 -> "auth_revocable_flag",
          4 -> "auth_immutable_flag", 8 -> "auth_clawback_enabled_flag")
          .map { case (bit, key) => // all four arms, `effects.go:1211-1224`
            kvRaw(key,
              when(col("op.set_flags").bitwiseAND(bit) =!= 0, lit("true"))
                .when(col("op.clear_flags").bitwiseAND(bit) =!= 0, lit("false")))
          }: _*))),
      when(col("op.inflation_dest_key").isNotNull,
        eff(7, sourceAddr, obj(kv("inflation_destination",
          strkeyAccount(col("op.inflation_dest_key")))))),
      when(col("op.signer_key").isNotNull,
        when(col("op.signer_weight") === 0,
          eff(11, sourceAddr, obj(kv("public_key",
            strkeyAccount(col("op.signer_key"))))))
          .otherwise(eff(10, sourceAddr, obj(
            kv("public_key", strkeyAccount(col("op.signer_key"))),
            kvRaw("weight", col("op.signer_weight")))))))
      , e => e.isNotNull)

    // trust lines ----------------------------------------------------------
    val trustAssetKvs = assetKvs(col("op.trust_asset")) :+
      kv("liquidity_pool_id", when(col("op.trust_pool_id").isNotNull,
        lower(hex(col("op.trust_pool_id")))))
    // created/updated/removed from the op's trustline ledger-entry change
    // whose asset type matches the op line (`addChangeTrustEffects`,
    // effects.go:637-695); limit-only heuristic as fallback when the model
    // carries no change entry
    val tlChange = {
      val lineType = coalesce(col("op.trust_asset.asset_type"), lit("pool_share"))
      val matches = filter(col("op.changes"), c =>
        c("entry_type") === "trustline" && c("tl_asset_type") === lineType)
      get(matches, size(matches) - 1)
    }
    val changeTrustType = when(tlChange("change_kind") === 0, 20)
      .when(tlChange("change_kind") === 2, 21)
      .when(tlChange("change_kind") === 1, 22)
      .otherwise(when(col("op.trust_limit_stroops") > 0, 20).otherwise(21))
    val changeTrust = array(
      effC(changeTrustType, sourceAddr, obj(
        kv("limit", amt(col("op.trust_limit_stroops"))) +: trustAssetKvs: _*)))
    // set_trust_line_flags (21): ONE effect; each flag renders true when
    // present in set-flags and false when in clear-flags, clear winning on
    // overlap (`setTrustLineFlagDetails` applied set-then-clear,
    // effects.go:1124-1134)
    val tlSetF = coalesce(col("op.tl_set_flags"), lit(0))
    val tlClearF = coalesce(col("op.tl_clear_flags"), lit(0))
    val trustorKvs = Seq(kv("trustor", strkeyAccount(col("op.trustor_key")))) ++
      assetKvs(col("op.trust_asset"))
    val tlFlagsUpdated = array(
      eff(26, sourceAddr, obj(trustorKvs ++ Seq(
          1 -> "authorized_flag",
          2 -> "authorized_to_maintain_liabilites", // sic, `effects.go:1129`
          4 -> "clawback_enabled_flag").map { case (bit, key) =>
            kvRaw(key,
              when(tlClearF.bitwiseAND(bit) =!= 0, lit("false"))
                .when(tlSetF.bitwiseAND(bit) =!= 0, lit("true")))
          }: _*)))
    // allow_trust (7): TWO effects — the legacy flags-free details, then the
    // forward-compatibility flag rendering (`addAllowTrustEffects`,
    // effects.go:696-728): authorized → authorized_flag:true only;
    // maintain-liabilities → its flag true only; anything else clears both
    val af = coalesce(col("op.authorize_flags"), lit(0))
    val allowTrust = array(
      eff(26, sourceAddr, obj(trustorKvs: _*)),
      eff(26, sourceAddr, obj(trustorKvs ++ Seq(
        kvRaw("authorized_flag",
          when(af.bitwiseAND(1) =!= 0, lit("true"))
            .when(af.bitwiseAND(2) === 0, lit("false"))),
        kvRaw("authorized_to_maintain_liabilites",
          when(af.bitwiseAND(1) =!= 0, lit(null).cast("string"))
            .when(af.bitwiseAND(2) =!= 0, lit("true"))
            .otherwise(lit("false")))): _*)))

    // data / sequence ------------------------------------------------------
    // created vs updated classifies on the op's DATA entry change kind
    // (`addManageDataEffects` wraps the ledger-entry change); value nil is
    // always a removal, and absent change info falls back to created
    val dataCh = {
      val m = filter(col("op.changes"), c =>
        c("entry_type") === "data" && c("change_kind").isNotNull)
      get(m, size(m) - 1)
    }
    val manageData = array(
      when(col("op.data_value").isNotNull,
        effC(when(dataCh.isNotNull && dataCh("change_kind") === 1, lit(42))
            .otherwise(lit(40)),
          sourceAddr, obj(kv("name", col("op.data_name")),
            kv("value", base64NoWrap(col("op.data_value"))))))
        .otherwise(eff(41, sourceAddr, obj(kv("name", col("op.data_name"))))))
    val bumpSequence = array(
      eff(43, sourceAddr, obj(kv("new_seq", col("op.bump_to").cast("string")))))

    // claimable balances ---------------------------------------------------
    val createCb = concat(
      array(eff(50, sourceAddr, obj(
        kv("balance_id", cbId), kv("amount", cbAmt), kv("asset", cbAsset)))),
      transform(col("op.claimants"), c =>
        eff(51, strkeyAccount(c("destination_key")), obj(
          kv("balance_id", cbId), kv("amount", cbAmt),
          kvRaw("predicate", claimPredicateJson(c("predicate_xdr"))),
          kv("asset", cbAsset)))),
      array(eff(3, sourceAddr,
        obj(kv("amount", cbAmt) +: assetKvs(col("op.cb_asset")): _*))))
    val claimCb = array(
      eff(52, sourceAddr, obj(
        kv("amount", cbAmt), kv("balance_id", cbId), kv("asset", cbAsset))),
      eff(2, sourceAddr,
        obj(kv("amount", cbAmt) +: assetKvs(col("op.cb_asset")): _*)))
    val clawback = array(
      eff(2, sourceAddr, obj(kv("amount", amount) +: assetKvs(opAsset): _*)),
      eff(3, destAddr, obj(kv("amount", amount) +: assetKvs(opAsset): _*)))
    val clawbackCb = array(
      eff(80, sourceAddr, obj(kv("balance_id", cbId))),
      eff(2, sourceAddr,
        obj(kv("amount", cbAmt) +: assetKvs(col("op.cb_asset")): _*)))

    // trades ---------------------------------------------------------------
    // offer atoms: the reference emits trade AND offer_updated/removed/
    // created for BOTH buyer and seller per claim (`addClaimTradeEffects`,
    // effects.go:986-1010), skipping offer_created on path payments;
    // LP atoms: one liquidity_pool_trade addressed to the op source
    def tradeDetails(a: Column, mine: String, theirs: String,
        counterparty: Column): Column =
      obj(Seq(
        kv("seller", counterparty),
        kvRaw("offer_id", a("offer_id")),
        kv("sold_amount", amt(a(s"amount_${mine}_stroops")))) ++
        assetKvs(a(if (mine == "sold") "asset_sold" else "asset_bought"),
          "sold_") ++ Seq(
        kv("bought_amount", amt(a(s"amount_${theirs}_stroops")))) ++
        assetKvs(a(if (theirs == "sold") "asset_sold" else "asset_bought"),
          "bought_"): _*)
    // atoms where both amounts are zero emit nothing
    // (`addIngestTradeEffects`, effects.go:966-971)
    def atomTradeEffects(isPathPayment: Boolean): Column =
      flatten(transform(filter(col("op.claim_atoms"), a =>
        a("amount_sold_stroops") =!= 0 || a("amount_bought_stroops") =!= 0), a => {
        val sellerAddr = when(a("seller_key").isNotNull,
          strkeyAccount(a("seller_key")))
        // buyer view bought what the atom sold, and vice versa
        val bd = tradeDetails(a, "bought", "sold", sellerAddr)
        val sd = tradeDetails(a, "sold", "bought", sourceAddr)
        val types = if (isPathPayment) Seq(33, 32, 31) else Seq(33, 32, 31, 30)
        when(a("atom_type") === "liquidity_pool",
          array(eff(92, sourceAddr, obj(
            // nested `liquidity_pool` details object
            // (`addClaimLiquidityPoolTradeEffect`, effects.go:1014-1032);
            // partial width — the atom's pool change carries no post state
            kvRaw("liquidity_pool", obj(
              kv("id", lower(hex(a("pool_id")))),
              kvRaw("fee_bp",
                lastPoolChange(col("op.changes"), a("pool_id"))("pre_pool_fee")),
              kv("type", lit("constant_product")))),
            kvRaw("sold", concat(lit("""{"asset":""""), canon(a("asset_sold")),
              lit("""","amount":""""), amt(a("amount_sold_stroops")), lit(""""}"""))),
            kvRaw("bought", concat(lit("""{"asset":""""), canon(a("asset_bought")),
              lit("""","amount":""""), amt(a("amount_bought_stroops")), lit(""""}""")))))))
          .otherwise(array(types.flatMap(t =>
            Seq(eff(t, sourceAddr, bd), eff(t, sellerAddr, sd))): _*))
      }))
    val tradeEffects = atomTradeEffects(isPathPayment = false)
    // only strict-SEND skips offer_created: strict-receive calls
    // addIngestTradeEffects with isPathPayment=false (`effects.go:471` vs
    // `:488`) — the real 10_ledgers effects golden shows created pairs on a
    // successful strict-receive
    val pathPaymentTrades =
      concat(pathPayment, atomTradeEffects(isPathPayment = false))
    val pathPaymentSendTrades =
      concat(pathPayment, atomTradeEffects(isPathPayment = true))

    // liquidity pools ------------------------------------------------------
    val lpChange = lastPoolChange(col("op.changes"), col("op.pool_id"))
    // `liquidityPoolDetails` (effects.go:1249-1268) from a pool change's
    // post state (total_trustlines omitted: the model does not carry it)
    def lpDetailsOf(chg: Column): Column = obj(
      kv("id", lower(hex(chg("pool_id")))),
      kvRaw("fee_bp", chg("pre_pool_fee")),
      kv("type", lit("constant_product")),
      kv("total_shares", amt(chg("post_total_shares"))),
      kvRaw("reserves", concat(
        lit("""[{"asset":""""), canon(chg("pool_asset_a")),
        lit("""","amount":""""), amt(chg("post_reserve_a")),
        lit(""""},{"asset":""""), canon(chg("pool_asset_b")),
        lit("""","amount":""""), amt(chg("post_reserve_b")), lit(""""}]"""))))
    def lpPoolDetails: Column = lpDetailsOf(lpChange)
    def lpReserves(negate: Boolean): Column = {
      def delta(pre: String, post: String): Column =
        if (negate) lpChange(pre) - lpChange(post)
        else lpChange(post) - lpChange(pre)
      concat(
        lit("""[{"asset":""""), canon(lpChange("pool_asset_a")),
        lit("""","amount":""""), amt(delta("pre_reserve_a", "post_reserve_a")),
        lit(""""},{"asset":""""), canon(lpChange("pool_asset_b")),
        lit("""","amount":""""), amt(delta("pre_reserve_b", "post_reserve_b")),
        lit(""""}]"""))
    }
    val lpDeposit = array(eff(90, sourceAddr, obj(
      kvRaw("liquidity_pool", lpPoolDetails),
      kvRaw("reserves_deposited", lpReserves(negate = false)),
      kv("shares_received",
        amt(lpChange("post_total_shares") - lpChange("pre_total_shares"))))))
    val lpWithdraw = array(eff(91, sourceAddr, obj(
      kvRaw("liquidity_pool", lpPoolDetails),
      kvRaw("reserves_received", lpReserves(negate = true)),
      kv("shares_redeemed",
        amt(lpChange("pre_total_shares") - lpChange("post_total_shares"))))))

    // LP-share revocation (`addLiquidityPoolRevokedEffect`,
    // effects.go:1160-1224), appended to allow_trust/set_trust_line_flags:
    // when the op's changes carry an LP product delta AND created claimable
    // balances, emit CB-created effects (50 + claimant 51s) per balance,
    // then one liquidity_pool_revoked (95) whose reserves_revoked lists the
    // reserve assets matched to their reclaiming balance
    // core's CB metadata order is unspecified, so the reference sorts the
    // created balances by asset before emitting (`sort.Sort(cbs)`,
    // effects.go:1139,1176: XDR Asset ordering = type, then code, then
    // issuer) — replicate with an array_sort on a (type-rank, code, issuer)
    // key so effect indices match with ≥2 created CBs
    val revCbs = {
      val unsorted = filter(col("op.changes"), c => c("cb_revocation").isNotNull)
      def rank(a: Column): Column =
        when(a("asset_type") === "native", lit(0))
          .when(a("asset_type") === "credit_alphanum4", lit(1)).otherwise(lit(2))
      transform(
        array_sort(transform(unsorted, c => struct(
          rank(c("cb_revocation")("asset")).as("r"),
          c("cb_revocation")("asset")("asset_code").as("c"),
          c("cb_revocation")("asset")("asset_issuer").as("i"),
          c.as("ch")))),
        s => s("ch"))
    }
    val revPool = {
      val m = filter(col("op.changes"), c =>
        c("entry_type") === "liquidity_pool" && c("pre_reserve_a").isNotNull)
      get(m, size(m) - 1)
    }
    def cbIdOf(c: Column): Column =
      concat(lit("00000000"), lower(hex(c("balance_id"))))
    val cbCreatedEffs = flatten(transform(revCbs, c => {
      val r = c("cb_revocation")
      array(
        eff(50, sourceAddr, obj(
          kv("balance_id", cbIdOf(r)), kv("amount", amt(r("amount_stroops"))),
          kv("asset", canon(r("asset"))))),
        eff(51, strkeyAccount(r("claimant_key")), obj(
          kv("balance_id", cbIdOf(r)), kv("amount", amt(r("amount_stroops"))),
          kvRaw("predicate", claimPredicateJson(r("claimant_predicate_xdr"))),
          kv("asset", canon(r("asset"))))))
    }))
    def revEntry(assetCol: Column, preC: Column, postC: Column): Column = {
      val matched = get(filter(revCbs, c =>
        canon(c("cb_revocation")("asset")) === canon(assetCol)), lit(0))
      when(matched.isNotNull, concat(
        lit("""{"asset":""""), canon(assetCol),
        lit("""","amount":""""), amt(preC - postC),
        lit("""","claimable_balance_id":""""),
        cbIdOf(matched("cb_revocation")), lit(""""}""")))
    }
    val revocation = when(revPool.isNotNull && size(revCbs) > 0,
      concat(cbCreatedEffs, array(eff(95, sourceAddr, obj(
        kvRaw("liquidity_pool", lpDetailsOf(revPool)),
        kvRaw("reserves_revoked", concat(lit("["), concat_ws(",",
          revEntry(revPool("pool_asset_a"),
            revPool("pre_reserve_a"), revPool("post_reserve_a")),
          revEntry(revPool("pool_asset_b"),
            revPool("pre_reserve_b"), revPool("post_reserve_b"))), lit("]"))),
        kv("shares_revoked",
          amt(revPool("pre_total_shares") - revPool("post_total_shares"))))))))
      .otherwise(noEff)

    // soroban --------------------------------------------------------------
    // affected entries render as base64 XDR TTL ledger keys
    // (discriminant LEDGER_ENTRY_TYPE_TTL = 9 ‖ 32-byte key hash), from the
    // op's TTL entry changes; non-TTL changes are ignored
    // (`addExtendFootprintTtlEffect`/`addRestoreFootprintExpirationEffect`,
    // effects.go:1434-1513)
    val ttlEntriesJson = {
      val keys = transform(
        filter(col("op.changes"), c => c("ttl_key_hash").isNotNull),
        c => base64NoWrap(concat(
          lit(Array[Byte](0, 0, 0, 9)), c("ttl_key_hash"))))
      concat(lit("["),
        array_join(transform(keys, e => concat(lit("\""), e, lit("\""))), ","),
        lit("]"))
    }
    val extendTtl = array(eff(98, sourceAddr, obj(
      kvRaw("entries", ttlEntriesJson),
      kvRaw("extend_to", col("op.extend_to")))))
    val restoreFootprint = array(eff(99, sourceAddr,
      obj(kvRaw("entries", ttlEntriesJson))))

    // invoke-host-function: credit/debit effects from SAC events
    // (`addInvokeHostFunctionEffects`, effects.go:1319-1430) — account
    // parties (G…) get account_credited/debited addressed to themselves;
    // contract parties (C…) get contract_credited/debited addressed to the
    // OP SOURCE with the C-address in a `contract` detail key; every SAC
    // detail map carries `contract_event_type`; mint credits only,
    // burn/clawback debit only
    val invokeEffects = flatten(transform(
      sacEventsParse(col("op.sac_events")), e => {
        val assetKvsE = Seq(
          kv("asset_type", e("asset_type")),
          kv("asset_code", e("asset_code")),
          kv("asset_issuer", e("asset_issuer")))
        // amount.String128 scaling: decimal(38,7) holds all but the last
        // digit of the i128 range without long overflow; 39-digit outliers
        // keep the raw integer string rather than throwing under ANSI.
        // Cast to (38,7) BEFORE dividing — (38,0)/(20,0) would land on
        // (38,6) and zero the 7th decimal digit.
        val scaledAmt = when(length(e("amount")) <= 31,
          (e("amount").cast("decimal(38,7)") /
            lit(graft.codec.Amounts.StroopsPerLumen))
            .cast("decimal(38,7)").cast("string"))
          .otherwise(e("amount"))
        val baseKvs = (kv("amount", scaledAmt) +: assetKvsE) :+
          kv("contract_event_type", e("event_type"))
        val accDetails = obj(baseKvs: _*)
        def contractDetails(cAddr: Column) =
          obj((baseKvs :+ kv("contract", cAddr)): _*)
        filter(array(
          when(e("from").isNotNull,
            when(e("from").startsWith("C"),
              effC(lit(97), sourceAddr, contractDetails(e("from"))))
              .otherwise(effC(lit(3), e("from"), accDetails))),
          when(e("to").isNotNull,
            when(e("to").startsWith("C"),
              effC(lit(96), sourceAddr, contractDetails(e("to"))))
              .otherwise(effC(lit(2), e("to"), accDetails)))),
          x => x.isNotNull)
      }))

    // sponsorship families (60-74): change-derived, appended AFTER the
    // op-specific effects for EVERY op type — the reference iterates the
    // op's changes emitting the entry-sponsorship effect then any
    // signer-sponsorship effects per change (effects.go:141-151).
    // created/updated/removed classify on pre/post sponsor presence, not on
    // the entry change kind (effects.go:296-317); same-sponsor transitions
    // emit nothing. Account/trustline effects address the entry's owning
    // account; data/claimable-balance effects address the op source.
    val spBase = typedLit(Map("account" -> 60, "trustline" -> 63,
      "data" -> 66, "claimable_balance" -> 69))
    val sponsorshipEffects = flatten(transform(col("op.changes"), c => {
      val sp = c("sponsorship")
      val base = try_element_at(spBase, c("entry_type"))
      val preSp = when(sp("pre_sponsor_key").isNotNull,
        strkeyAccount(sp("pre_sponsor_key")))
      val postSp = when(sp("post_sponsor_key").isNotNull,
        strkeyAccount(sp("post_sponsor_key")))
      val addr = when(sp("subject_key").isNotNull,
        strkeyAccount(sp("subject_key"))).otherwise(sourceAddr)
      // per-entry-type detail extras (`effects.go:331-352`): trustline
      // asset (canonical, or pool-share id), data name, CB balance id
      val extras = Seq(
        kv("asset", when(sp("tl_asset").isNotNull, canon(sp("tl_asset")))),
        kv("asset_type", when(sp("tl_pool_id").isNotNull,
          lit("liquidity_pool"))),
        kv("liquidity_pool_id", when(sp("tl_pool_id").isNotNull,
          lower(hex(sp("tl_pool_id"))))),
        kv("data_name", sp("data_name")),
        kv("balance_id", when(sp("cb_id").isNotNull,
          concat(lit("00000000"), lower(hex(sp("cb_id")))))))
      val entryEff =
        when(base.isNotNull && preSp.isNull && postSp.isNotNull,
          effC(base, addr, obj(kv("sponsor", postSp) +: extras: _*)))
          .when(base.isNotNull && preSp.isNotNull && postSp.isNull,
            effC(base + 2, addr,
              obj(kv("former_sponsor", preSp) +: extras: _*)))
          .when(base.isNotNull && preSp.isNotNull && postSp.isNotNull &&
              preSp =!= postSp,
            effC(base + 1, addr, obj(Seq(kv("new_sponsor", postSp),
              kv("former_sponsor", preSp)) ++ extras: _*)))
      // signer sponsorships (account entries): diff the pre/post
      // signer→sponsor maps, emitting per signer in strkey order
      // (effects.go:225-285)
      def sigMap(entries: Column): Column = map_from_entries(
        transform(entries, s => struct(
          strkeyAccount(s("signer_key")).as("k"),
          strkeyAccount(s("sponsor_key")).as("v"))))
      val preM = sigMap(sp("pre_signer_sponsors"))
      val postM = sigMap(sp("post_signer_sponsors"))
      val signerEffs = transform(
        array_sort(array_union(map_keys(preM), map_keys(postM))), k => {
          val pv = try_element_at(preM, k)
          val nv = try_element_at(postM, k)
          when(pv.isNull && nv.isNotNull, effC(lit(72), addr,
            obj(kv("sponsor", nv), kv("signer", k))))
            .when(pv.isNotNull && nv.isNull, effC(lit(74), addr,
              obj(kv("former_sponsor", pv), kv("signer", k))))
            .when(pv.isNotNull && nv.isNotNull && pv =!= nv,
              effC(lit(73), addr, obj(kv("former_sponsor", pv),
                kv("new_sponsor", nv), kv("signer", k))))
        })
      filter(concat(array(entryEff), coalesce(signerEffs, noEff)),
        x => x.isNotNull)
    }))

    val effectsArr =
      when(ty === 0, createAccount)
        .when(ty === 1, payment)
        .when(ty === 2, pathPaymentTrades)
        .when(ty === 13, pathPaymentSendTrades)
        .when(ty.isin(3, 4, 12), tradeEffects)
        .when(ty === 5, setOptions)
        .when(ty === 6, changeTrust)
        .when(ty === 7, concat(allowTrust, revocation))
        .when(ty === 21, concat(tlFlagsUpdated, revocation))
        .when(ty === 8, accountMerge)
        .when(ty === 9, inflation)
        .when(ty === 10, manageData)
        .when(ty === 11, bumpSequence)
        .when(ty === 14, createCb)
        .when(ty === 15, claimCb)
        .when(ty === 19, clawback)
        .when(ty === 20, clawbackCb)
        .when(ty === 22, lpDeposit)
        .when(ty === 23, lpWithdraw)
        .when(ty === 24, invokeEffects)
        .when(ty === 25, extendTtl)
        .when(ty === 26, restoreFootprint)
        .otherwise(noEff)

    // LP entry-change loop (`addLedgerEntryLiquidityPoolEffects`,
    // effects.go:373-402), after the sponsorship loop: created pool entries
    // emit 93 with full pool details, removed ones 94 with the id; updates
    // (and the kind-less LP deltas of deposit/withdraw/revocation) emit
    // nothing. Addressed to the op source.
    val lpEntryEffects = filter(transform(col("op.changes"), c =>
      when(c("entry_type") === "liquidity_pool" && c("change_kind") === 0,
        effC(lit(93), sourceAddr,
          obj(kvRaw("liquidity_pool", lpDetailsOf(c)))))
        .when(c("entry_type") === "liquidity_pool" && c("change_kind") === 2,
          effC(lit(94), sourceAddr,
            obj(kv("liquidity_pool_id", lower(hex(c("pool_id")))))))),
      x => x.isNotNull)

    val allEffects = concat(effectsArr,
      coalesce(sponsorshipEffects, noEff), coalesce(lpEntryEffects, noEff))

    // `addMuxed` (effects.go:173-194): when the acting participant was
    // addressed in muxed form, `address` is the unmuxed G-account and
    // `address_muxed` the M-address. In the fixture model muxing can ride
    // on the tx source (source_muxed_id) or the op destination
    // (destination_muxed_id); every other addressee goes through
    // `addUnmuxed` ⇒ null.
    val addressMuxed =
      when(col("e.address") === destAddr &&
          col("op.destination_muxed_id").isNotNull,
        strkeyMuxed(col("op.destination_key"), col("op.destination_muxed_id")))
        .when(col("e.address") === sourceAddr && col("op.source_key").isNull &&
            col("tx.source_muxed_id").isNotNull,
          strkeyMuxed(col("tx.source_key"), col("tx.source_muxed_id")))

    ops
      .select(col("sequence"), col("closed_at"), col("tx_pos"), col("op"),
        col("tx"),
        operationToid(col("sequence"), col("tx_pos") + 1, col("op_pos"))
          .as("operation_id"),
        posexplode(allEffects).as(Seq("eff_pos", "e")))
      .select(
        col("e.address").as("address"),
        addressMuxed.as("address_muxed"),
        col("operation_id"),
        // reference `details` is a per-type map (`schema.go:360`); the
        // builders above render it as a JSON string — VARIANT restores the
        // raw-object rendering on every output format
        parse_json(col("e.details")).as("details"),
        col("e.type").as("type"),
        col("e.type_string").as("type_string"),
        col("closed_at"),
        col("sequence").as("ledger_sequence"),
        // ZERO-based index and id, the reference's numbering
        // (`operationEffects` tail: EffectIndex = uint32(i),
        // EffectId = "{operationID}-{index}")
        col("eff_pos").cast("long").as("index"),
        concat(col("operation_id").cast("string"), lit("-"),
          col("eff_pos").cast("string")).as("id"))
  }
}
