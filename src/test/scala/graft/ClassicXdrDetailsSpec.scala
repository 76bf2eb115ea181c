package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{Hashes, StellarXdr, Strkey, XdrEncode}
import graft.model.LedgerModel._
import graft.operators.StellarTransforms

/** Reference-law details for the classic arms ABSENT from the published
  * golden corpus, driven through real wire bytes ([[XdrEncode]] →
  * [[StellarXdr]] → the unchanged transforms):
  *
  *   - revoke_sponsorship ledger-key arms (account / trustline classic /
  *     trustline pool-share / offer / data / claimable balance / liquidity
  *     pool — `addLedgerKeyToDetails`, the per-family key payloads)
  *   - the muxed-account detail pairs on every muxed-able prefix
  *     (`addAccountAndMuxedAccountDetails`: funder, account, into,
  *     claimant) — the goldens predate M-addresses.
  */
class ClassicXdrDetailsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val om = new ObjectMapper()

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-classic-xdr-details")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def key(s: String): Array[Byte] = Hashes.sha256(s.getBytes("UTF-8"))

  private def ledgerRowOf(op: XdrEncode.OpBody, res: XdrEncode.OpResultSpec,
      sourceMuxedId: Option[Long] = None,
      metaB64: String = ""): LedgerRow = {
    val env = XdrEncode.txEnvelopeV1(XdrEncode.TxSpec(
      sourceKey = key("src"), fee = 200L, seqNum = 9L, ops = Seq(op),
      sourceMuxedId = sourceMuxedId))
    val result = XdrEncode.txResult(100L, 0, Seq(res))
    def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)
    val header = XdrEncode.ledgerHeader(
      XdrEncode.HeaderSpec(seq = 42424L, closeTime = 1719000000L))
    StellarXdr.decodeLedgerRow(b64(header),
      Seq(StellarXdr.TxInput(b64(env), b64(result), metaB64)))
  }

  private def detailsOf(op: XdrEncode.OpBody, res: XdrEncode.OpResultSpec,
      sourceMuxedId: Option[Long] = None,
      metaB64: String = ""): com.fasterxml.jackson.databind.JsonNode = {
    val row = ledgerRowOf(op, res, sourceMuxedId, metaB64)
    val s = spark; import s.implicits._
    val out = StellarTransforms.historyOperations(Seq(row).toDS())
      .selectExpr("cast(details_json as string) as dj").collect().head
    om.readTree(out.getString(0))
  }

  test("revoke_sponsorship: all six ledger-key families render the " +
      "reference's per-family key payloads") {
    val acct = key("victim")
    // account arm → account_id alone
    val dAcct = detailsOf(
      XdrEncode.revokeLedgerKeyOp(XdrEncode.accountLedgerKey(acct)),
      XdrEncode.OpResultSpec(18, 0))
    assert(dAcct.get("account_id").asText() == Strkey.encodeAccountId(acct))
    assert(dAcct.get("trustline_account_id") == null)
    assert(dAcct.get("offer_id") == null)

    // trustline classic arm → trustline_account_id + canonical asset
    val issuer = key("issuer")
    val dTl = detailsOf(XdrEncode.revokeLedgerKeyOp(
        XdrEncode.trustlineLedgerKey(acct, AssetRef("credit_alphanum4",
          "USDX", Strkey.encodeAccountId(issuer)))),
      XdrEncode.OpResultSpec(18, 0))
    assert(dTl.get("trustline_account_id").asText() ==
      Strkey.encodeAccountId(acct))
    assert(dTl.get("trustline_asset").asText() ==
      s"USDX:${Strkey.encodeAccountId(issuer)}")
    assert(dTl.get("account_id") == null)

    // trustline pool-share arm → trustline_liquidity_pool_id (+ strkey)
    val pool = key("pool")
    val dTlp = detailsOf(XdrEncode.revokeLedgerKeyOp(
        XdrEncode.trustlinePoolShareLedgerKey(acct, pool)),
      XdrEncode.OpResultSpec(18, 0))
    assert(dTlp.get("trustline_account_id").asText() ==
      Strkey.encodeAccountId(acct))
    assert(dTlp.get("trustline_liquidity_pool_id").asText() ==
      Hashes.hex(pool))
    assert(dTlp.get("trustline_liquidity_pool_id_strkey").asText() ==
      Strkey.encodeLiquidityPool(pool))
    assert(dTlp.get("trustline_asset") == null)

    // offer arm → offer_id alone (no seller key in the reference output)
    val dOffer = detailsOf(XdrEncode.revokeLedgerKeyOp(
        XdrEncode.offerLedgerKey(acct, 987654L)),
      XdrEncode.OpResultSpec(18, 0))
    assert(dOffer.get("offer_id").asLong() == 987654L)
    assert(dOffer.get("account_id") == null)

    // data arm → data_account_id + data_name
    val dData = detailsOf(XdrEncode.revokeLedgerKeyOp(
        XdrEncode.dataLedgerKey(acct, "cfg-entry")),
      XdrEncode.OpResultSpec(18, 0))
    assert(dData.get("data_account_id").asText() ==
      Strkey.encodeAccountId(acct))
    assert(dData.get("data_name").asText() == "cfg-entry")
    assert(dData.get("account_id") == null)

    // claimable-balance arm → hex + strkey pair
    val cb = key("cbid")
    val dCb = detailsOf(XdrEncode.revokeLedgerKeyOp(
        XdrEncode.claimableBalanceLedgerKey(cb)),
      XdrEncode.OpResultSpec(18, 0))
    assert(dCb.get("claimable_balance_id").asText() ==
      "00000000" + Hashes.hex(cb))
    assert(dCb.get("claimable_balance_id_strkey") != null)

    // liquidity-pool arm → the SHARED liquidity_pool_id pair
    val dLp = detailsOf(XdrEncode.revokeLedgerKeyOp(
        XdrEncode.liquidityPoolLedgerKey(pool)),
      XdrEncode.OpResultSpec(18, 0))
    assert(dLp.get("liquidity_pool_id").asText() == Hashes.hex(pool))
    assert(dLp.get("liquidity_pool_id_strkey").asText() ==
      Strkey.encodeLiquidityPool(pool))
  }

  test("muxed prefixes: account_merge / create_account / claim_cb emit " +
      "the _muxed pairs for M-address actors") {
    val dest = key("dest")
    val dMerge = detailsOf(
      XdrEncode.accountMergeOp(dest, destMuxId = Some(777L)),
      XdrEncode.OpResultSpec(8, 0, _.i64(5000L)),
      sourceMuxedId = Some(123L))
    assert(dMerge.get("account").asText() ==
      Strkey.encodeAccountId(key("src")))
    assert(dMerge.get("account_muxed").asText() ==
      Strkey.encodeMuxed(key("src"), 123L))
    assert(dMerge.get("account_muxed_id").asLong() == 123L)
    assert(dMerge.get("into").asText() == Strkey.encodeAccountId(dest))
    assert(dMerge.get("into_muxed").asText() ==
      Strkey.encodeMuxed(dest, 777L))
    assert(dMerge.get("into_muxed_id").asLong() == 777L)

    val dCreate = detailsOf(
      XdrEncode.createAccountOp(dest, 50000000L),
      XdrEncode.OpResultSpec(0, 0),
      sourceMuxedId = Some(55L))
    assert(dCreate.get("funder").asText() ==
      Strkey.encodeAccountId(key("src")))
    assert(dCreate.get("funder_muxed").asText() ==
      Strkey.encodeMuxed(key("src"), 55L))
    assert(dCreate.get("funder_muxed_id").asLong() == 55L)

    val dClaim = detailsOf(
      XdrEncode.claimClaimableBalanceOp(key("bal")),
      XdrEncode.OpResultSpec(15, 0),
      sourceMuxedId = Some(9L))
    assert(dClaim.get("claimant").asText() ==
      Strkey.encodeAccountId(key("src")))
    assert(dClaim.get("claimant_muxed_id").asLong() == 9L)

    // and WITHOUT a muxed actor, none of the _muxed keys appear
    val dPlain = detailsOf(XdrEncode.accountMergeOp(dest),
      XdrEncode.OpResultSpec(8, 0, _.i64(1L)))
    assert(dPlain.get("account_muxed") == null &&
      dPlain.get("into_muxed") == null)
  }

  test("sponsor detail + sponsorship effects off real meta bytes: created " +
      "sponsored entries and signer sponsors survive the decode") {
    def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)
    val sponsor = key("sponsor")
    // begin_sponsoring whose op change CREATES a sponsored data entry
    val metaData = XdrEncode.txMetaV3(XdrEncode.TxMetaV3Spec(
      opChanges = Seq(Seq(XdrEncode.change(0,
        XdrEncode.ledgerEntrySponsored(5L,
          XdrEncode.dataEntry(key("owner"), "cfg", Array[Byte](1, 2)),
          sponsor))))))
    val d = detailsOf(XdrEncode.beginSponsoringOp(key("sponsoree")),
      XdrEncode.OpResultSpec(16, 0), metaB64 = b64(metaData))
    assert(d.get("sponsor").asText() == Strkey.encodeAccountId(sponsor))

    // ...and the same decoded change drives the data sponsorship effect
    val s = spark; import s.implicits._
    val effects = graft.operators.StellarTradesEffects.historyEffects(
      Seq(ledgerRowOf(XdrEncode.beginSponsoringOp(key("sponsoree")),
        XdrEncode.OpResultSpec(16, 0), metaB64 = b64(metaData))).toDS())
      .selectExpr("type_string", "to_json(details) as dj").collect()
    val spEff = effects.filter(_.getString(0) == "data_sponsorship_created")
    assert(spEff.nonEmpty,
      effects.map(_.getString(0)).mkString(","))
    assert(om.readTree(spEff.head.getString(1)).get("sponsor").asText() ==
      Strkey.encodeAccountId(sponsor))

    // set_options adding a SPONSORED SIGNER: the account change's
    // signer-sponsor map diff drives the sponsor detail (signer arm)
    val sig = key("newsigner")
    val sigSponsor = key("sigsponsor")
    val metaSigner = XdrEncode.txMetaV3(XdrEncode.TxMetaV3Spec(
      opChanges = Seq(Seq(
        XdrEncode.change(3, XdrEncode.ledgerEntry(4L,
          XdrEncode.accountEntryWithSigners(key("src"), 1000L, Nil))),
        XdrEncode.change(1, XdrEncode.ledgerEntry(5L,
          XdrEncode.accountEntryWithSigners(key("src"), 1000L,
            Seq(sig -> Some(sigSponsor)))))))))
    val d2 = detailsOf(XdrEncode.setOptionsSignerOp(sig, 2L),
      XdrEncode.OpResultSpec(5, 0), metaB64 = b64(metaSigner))
    assert(d2.get("sponsor").asText() == Strkey.encodeAccountId(sigSponsor))
    assert(d2.get("signer_key").asText() == Strkey.encodeAccountId(sig))
  }

  test("LiquidityPoolEntry wire pair: one body discriminant, full " +
      "pre/post OpChange, loud truncation") {
    val pool = key("lp-pool")
    val usd = AssetRef("credit_alphanum4", "USD",
      Strkey.encodeAccountId(key("lp-issuer")))
    def lp(rA: Long, rB: Long, sh: Long, tl: Long) = XdrEncode.ledgerEntry(7L,
      XdrEncode.liquidityPoolEntry(pool, AssetRef("native", "", ""), usd,
        30, rA, rB, sh, tl))
    val meta = XdrEncode.txMetaV3(XdrEncode.TxMetaV3Spec(opChanges = Seq(Seq(
      XdrEncode.change(3, lp(1000L, 2000L, 500L, 4L)),
      XdrEncode.change(1, lp(1100L, 2300L, 560L, 5L))))))
    val row = ledgerRowOf(
      XdrEncode.lpDepositOp(pool, 100L, 300L, 1, 2, 3, 4),
      XdrEncode.OpResultSpec(22, 0),
      metaB64 = java.util.Base64.getEncoder.encodeToString(meta))
    val ch = row.transactions.head.operations.head.changes
      .filter(_.entry_type == "liquidity_pool")
    assert(ch.size == 1)
    val c = ch.head
    assert(c.pre_reserve_a.contains(1000L) && c.post_reserve_a.contains(1100L))
    assert(c.pre_reserve_b.contains(2000L) && c.post_reserve_b.contains(2300L))
    assert(c.pre_total_shares.contains(500L) &&
      c.post_total_shares.contains(560L))
    assert(c.post_trustline_count.contains(5L))
    assert(c.pre_pool_fee.contains(30L))
    assert(c.pool_asset_a.exists(_.asset_type == "native"))
    assert(c.pool_asset_b.exists(_.asset_code == "USD"))

    // every truncation of the meta fails loudly — no silent partial entry
    for (n <- 0 until meta.length by 3) {
      intercept[Exception](StellarXdr.decodeTxMeta(
        java.util.Arrays.copyOf(meta, n)))
    }
  }

  test("ClaimableBalanceEntry ext-v1 wire pair: clawback flag + pre-image " +
      "amount/asset feed claim details, loud truncation") {
    val bid = key("cb-id")
    val claimant = key("cb-claimant")
    val entry = XdrEncode.ledgerEntry(7L, XdrEncode.claimableBalanceEntry(
      bid, Seq(claimant), AssetRef("native", "", ""), 12345678L,
      clawbackEnabled = true))
    val meta = XdrEncode.txMetaV3(XdrEncode.TxMetaV3Spec(opChanges = Seq(Seq(
      XdrEncode.change(3, entry),
      XdrEncode.change(2, XdrEncode.claimableBalanceLedgerKey(bid))))))
    val row = ledgerRowOf(
      XdrEncode.claimClaimableBalanceOp(bid),
      XdrEncode.OpResultSpec(15, 0),
      metaB64 = java.util.Base64.getEncoder.encodeToString(meta))
    val op = row.transactions.head.operations.head
    // claim amount/asset come from the removed entry's pre-image
    assert(op.cb_amount_stroops.contains(12345678L))
    assert(op.cb_asset.exists(_.asset_type == "native"))
    val cbCh = op.changes.filter(_.entry_type == "claimable_balance")
    assert(cbCh.exists(c => c.change_kind.contains(2) &&
      c.cb_clawback_enabled.contains(true)))
    // the rendered claim effect carries flag + exact amount
    val s2 = spark; import s2.implicits._
    val eff = graft.operators.StellarTradesEffects
      .historyEffects(Seq(row).toDS())
      .selectExpr("type", "to_json(details) AS d").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(eff(52).contains("\"claimable_balance_clawback_enabled_flag\":true"))
    assert(eff(52).contains("\"amount\":\"1.2345678\""))
    assert(eff(2).contains("\"asset_type\":\"native\""))

    for (n <- 0 until meta.length by 3) {
      intercept[Exception](StellarXdr.decodeTxMeta(
        java.util.Arrays.copyOf(meta, n)))
    }
  }
}
