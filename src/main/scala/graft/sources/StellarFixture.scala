package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.LedgerModel._

/** Deterministic in-memory generator of decoded ledgers (the shape the XDR
  * decode layer would emit). Used by specs and demos; all byte material is
  * derived from SHA-256 of labeled indices, so every run is identical. */
object StellarFixture {

  private def keyOf(label: String): Array[Byte] =
    graft.codec.Hashes.sha256(label.getBytes("UTF-8"))

  def op(l: Long, t: Int, o: Int): OpModel = {
    val ty = (l.toInt + t + o) % 27
    val isTrade = Seq(2, 3, 4, 12, 13).contains(ty)
    val nAtoms = if (isTrade) (o % 2) + 1 else 0
    val atoms = (0 until nAtoms).map { a =>
      val lp = ty == 2 && a == 0 // some path-payment atoms cross an LP
      ClaimAtom(
        atom_type = if (lp) "liquidity_pool" else "offer",
        seller_key = if (lp) None else Some(keyOf(s"seller-$l-$t-$o-$a")),
        offer_id = if (lp) None else Some(5000L + a),
        pool_id = if (lp) Some(keyOf(s"pool-$l")) else None,
        amount_sold_stroops = 2000000L * (a + 1),
        amount_bought_stroops = 1500000L * (a + 1),
        asset_sold = AssetRef("credit_alphanum4", s"SL$a", s"IS${a % 2}"),
        asset_bought = AssetRef("native", "", ""))
    }
    // change list: a decoy early change + the authoritative last pre-state
    val changes = atoms.flatMap { a =>
      if (a.atom_type == "offer" && a.offer_id.isDefined) Seq(
        OpChange("offer", a.seller_key, a.offer_id, None,
          Some(1), Some(99), None), // stale state: must NOT win
        OpChange("offer", a.seller_key, a.offer_id, None,
          Some(7), Some(2), None)) // pre-state: reverse scan finds this
      else if (a.atom_type == "liquidity_pool") Seq(
        OpChange("liquidity_pool", None, None, a.pool_id,
          None, None, Some(30L),
          pre_reserves_deposited = Some(5000000000L),
          pre_reserves_disbursed = Some(3000000000L)))
      else Seq.empty
    }
    OpModel(
      op_type = ty,
      source_key = if (o % 3 == 0) None else Some(keyOf(s"op-$l-$t-$o")),
      source_muxed_id = None,
      amount_stroops = 1000000L * (o + 1) + t,
      details_json = s"""{"amount":"${(o + 1).toDouble}","op":"$ty"}""",
      result_code = "OperationResultCodeOpInner",
      trace_code = "success",
      claim_atoms = atoms,
      changes = changes,
      // manage-offer ops keep a result offer when not fully consumed (o even);
      // path payments never carry one → synthetic buying id downstream
      result_offer_id =
        if (Seq(3, 4, 12).contains(ty) && o % 2 == 0) Some(7000L + o) else None,
      destination_key =
        // non-native payments (o odd) on even ledgers pay the issuer → burn
        if (ty == 1 && o % 2 == 1 && l % 2 == 0) Some(keyOf(s"issuer-ISS${o % 3}"))
        else if (ty == 1 || ty == 8 || ty == 19) Some(keyOf(s"dest-$l-$t-$o"))
        else None,
      destination_muxed_id = if (ty == 1 && o % 2 == 1) Some(4200L + o) else None,
      asset = if (ty == 1 || ty == 19)
        Some(AssetRef(if (o % 2 == 0) "native" else "credit_alphanum4",
          if (o % 2 == 0) "" else s"TK$o",
          if (o % 2 == 0) "" else s"ISS${o % 3}")) else None)
  }

  def tx(l: Long, t: Int): TxModel = {
    val memoKind = Seq("none", "text", "id", "hash", "return")(t % 5)
    TxModel(
      hash_hex = graft.codec.Hashes.sha256Hex(s"tx-$l-$t".getBytes("UTF-8")),
      source_key = keyOf(s"acct-$l-$t"),
      source_muxed_id = if (t % 4 == 0) Some(10000L + t) else None,
      account_sequence = l * 100 + t,
      max_fee = 5000L + t,
      fee_charged = 100L * (t + 1),
      successful = t % 3 != 0,
      result_code = if (t % 3 != 0) "TransactionResultCodeTxSuccess"
        else "TransactionResultCodeTxFailed",
      memo_type = memoKind,
      memo_text = if (memoKind == "text") Some(s"memo-$l-$t") else None,
      memo_id = if (memoKind == "id") Some(77000L + t) else None,
      memo_hash = if (memoKind == "hash" || memoKind == "return")
        Some(keyOf(s"memo-$l-$t")) else None,
      time_min = if (t % 2 == 0) Some(1700000000L + t) else None,
      time_max = if (t % 2 == 0) Some(if (t % 4 == 0) 0L else 1800000000L + t) else None,
      ledger_min = None, ledger_max = None,
      envelope_b64 = s"ENV-$l-$t", result_b64 = s"RES-$l-$t",
      meta_b64 = s"META-$l-$t", fee_meta_b64 = s"FEE-$l-$t",
      signers = (0 to t % 3).map(i => keyOf(s"signer-$l-$t-$i")),
      operations = (0 until (t % 4) + 1).map(o => op(l, t, o)),
      soroban = if (t % 5 == 2 || t % 5 == 4) Some(SorobanModel(
        resource_fee = 40000L + t, instructions = 1000000L + t,
        read_bytes = 5000, write_bytes = 2000,
        non_refundable_fee = 30000L + t, refundable_fee = 8000L,
        rent_fee = 1200L)) else None,
      fee_changes =
        if (t % 5 == 2) Seq(BalanceChange(keyOf(s"acct-$l-$t"), 900000000L, 900000000L - (45000L + t)))
        else if (t % 5 == 4) Seq(BalanceChange(keyOf(s"bump-$l-$t"), 700000000L, 700000000L - (52000L + t)))
        else Seq.empty,
      changes_after =
        if (t % 5 == 2 || t % 5 == 4)
          Seq(BalanceChange(keyOf(if (t % 5 == 4) s"bump-$l-$t" else s"acct-$l-$t"),
            100L, 100L + 6000L))
        else Seq.empty,
      is_fee_bump = t % 5 == 4,
      fee_bump_account_key = if (t % 5 == 4) Some(keyOf(s"bump-$l-$t")) else None,
      inner_hash_hex = if (t % 5 == 4)
        Some(graft.codec.Hashes.sha256Hex(s"inner-$l-$t".getBytes("UTF-8"))) else None,
      new_max_fee = if (t % 5 == 4) Some(10000L + t) else None)
  }

  def ledger(seq: Long): LedgerRow =
    LedgerRow(
      sequence = seq,
      ledger_hash = keyOf(s"ledger-$seq"),
      previous_ledger_hash = keyOf(s"ledger-${seq - 1}"),
      header_b64 = s"HDR-$seq",
      closed_at = new Timestamp(1700000000000L + seq * 5000L),
      total_coins = 105443902087310000L,
      fee_pool = 18244660537L + seq,
      base_fee = 100, base_reserve = 5000000, max_tx_set_size = 1000,
      protocol_version = if (seq % 3 == 0) 20 else 21,
      soroban_fee_write_1kb = 11800L,
      node_id_key = keyOf(s"node-${seq % 5}"),
      signature = keyOf(s"sig-$seq").take(16),
      bucket_list_size = 20_000_000_000L + seq,
      transactions = (0 until ((seq % 5) + 1).toInt).map(t => tx(seq, t)))

  def ledgers(spark: SparkSession, start: Long, end: Long): Dataset[LedgerRow] = {
    import spark.implicits._
    spark.createDataset((start to end).map(ledger))
  }

  // ---- change-grain fixture -------------------------------------------------

  import graft.model.ChangeModel._

  def accountChange(seq: Long, i: Int): ChangeRow = {
    val deleted = i % 7 == 6
    ChangeRow(
      ledger_sequence = seq,
      closed_at = new Timestamp(1700000000000L + seq * 5000L),
      change_order = i.toLong,
      ledger_entry_change = if (deleted) 2L else if (i % 3 == 0) 0L else 1L,
      entry_type = "account",
      deleted = deleted,
      last_modified_ledger = seq,
      account = Some(AccountState(
        account_key = keyOf(s"acct-${i % 9}"),
        balance_stroops = 10000000L * (i + 1) + seq,
        buying_liabilities_stroops = 500000L * i,
        selling_liabilities_stroops = 300000L * i,
        sequence_number = seq * 4096 + i,
        sequence_ledger = if (i % 2 == 0) Some(seq) else None,
        sequence_time = None,
        num_subentries = i % 5,
        inflation_destination_key = None,
        flags = i % 16, home_domain = s"home$i.example",
        master_weight = 1 + i % 3, threshold_low = 1, threshold_medium = 2,
        threshold_high = 3,
        sponsor_key = if (i % 4 == 0) Some(keyOf(s"sponsor-$i")) else None,
        num_sponsored = 0, num_sponsoring = 0,
        signers = (0 to i % 3).map(k =>
          SignerState(keyOf(s"sig-$i-$k"), 10 - k, None)))),
      offer = None, trustline = None)
  }

  def offerChange(seq: Long, i: Int): ChangeRow =
    ChangeRow(
      ledger_sequence = seq,
      closed_at = new Timestamp(1700000000000L + seq * 5000L),
      change_order = 100L + i,
      ledger_entry_change = 1L,
      entry_type = "offer",
      deleted = i % 5 == 4,
      last_modified_ledger = seq,
      account = None,
      offer = Some(OfferState(
        seller_key = keyOf(s"seller-${i % 6}"),
        offer_id = 9000L + i,
        selling_asset = AssetRef("credit_alphanum4", s"AS${i % 4}", s"ISS${i % 3}"),
        buying_asset = AssetRef("native", "", ""),
        amount_stroops = 25000000L + i,
        price_n = 1 + i % 9, price_d = 1 + i % 7, flags = i % 4,
        sponsor_key = None)),
      trustline = None)

  def changes(spark: SparkSession, start: Long, end: Long,
      perLedger: Int = 8): Dataset[ChangeRow] = {
    import spark.implicits._
    spark.createDataset(for {
      seq <- start to end
      i <- 0 until perLedger
      row <- Seq(accountChange(seq, i), offerChange(seq, i))
    } yield row)
  }
}
