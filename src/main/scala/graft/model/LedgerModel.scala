package graft.model

import java.sql.Timestamp

/** The decoded source grain: one row per ledger with nested transactions and
  * operations — what the XDR decode layer emits at the source boundary
  * (SURVEY §7.1: decode ONCE into nested columnar structs, then stay
  * declarative). Mirrors the information content of `LedgerCloseMeta` that the
  * reference's transforms consume (`internal/input/ledgers.go:25`,
  * `transactions.go:16-20`).
  *
  * Byte-typed fields hold raw key material (ed25519 keys, hashes); strkey /
  * hex / base64 rendering happens in the transforms, not the decoder. */
object LedgerModel {

  /** An asset reference inside envelopes/results. */
  case class AssetRef(asset_type: String, asset_code: String, asset_issuer: String)

  /** One claimed offer (claim atom) from a trade-producing op's result
    * (`trade.go:164-262`). Offer-type atoms always carry the claimed offer's
    * real on-chain `offer_id` (`trade.go:111` reads `claimOffer.OfferId()`
    * unconditionally); only LP atoms leave it None. */
  case class ClaimAtom(
      atom_type: String, // "offer" | "liquidity_pool"
      seller_key: Option[Array[Byte]],
      offer_id: Option[Long],
      pool_id: Option[Array[Byte]],
      amount_sold_stroops: Long,
      amount_bought_stroops: Long,
      asset_sold: AssetRef,
      asset_bought: AssetRef)

  /** One entry-change recorded under the op (application order preserved) —
    * the pre-state source for trade prices / pool fees (`trade.go:264-317`). */
  case class OpChange(
      entry_type: String, // "offer" | "liquidity_pool" | ...
      seller_key: Option[Array[Byte]],
      offer_id: Option[Long],
      pool_id: Option[Array[Byte]],
      pre_price_n: Option[Int], pre_price_d: Option[Int],
      pre_pool_fee: Option[Long],
      pre_reserves_deposited: Option[Long] = None,
      pre_reserves_disbursed: Option[Long] = None)

  /** One operation inside a transaction envelope. `details_json` carries the
    * per-type sparse union pre-serialized (SURVEY §1.2 option (b) at the
    * model boundary; the transform emits both `details` struct-JSON and the
    * passthrough string). */
  case class OpModel(
      op_type: Int,
      source_key: Option[Array[Byte]], // None → falls back to tx source
      source_muxed_id: Option[Long],
      amount_stroops: Long,
      details_json: String,
      result_code: String,
      trace_code: String,
      claim_atoms: Seq[ClaimAtom] = Seq.empty,
      changes: Seq[OpChange] = Seq.empty,
      /** The taker's own offer id from this op's ManageOfferSuccess result
        * (`trade.go:188-224` BuyingOffer); None ⇔ no result offer survived
        * (fully-consumed offer, or a path payment) → synthetic id downstream. */
      result_offer_id: Option[Long] = None,
      destination_key: Option[Array[Byte]] = None,
      destination_muxed_id: Option[Long] = None,
      asset: Option[AssetRef] = None)

  /** Fee-account balance change from fee meta / TxChangesAfter — the J4
    * lookup source (`transaction.go:277-305`). */
  case class BalanceChange(
      account_key: Array[Byte], balance_before: Long, balance_after: Long)

  /** Soroban transaction data (envelope ext + SorobanMeta ext V1). */
  case class SorobanModel(
      resource_fee: Long, instructions: Long, read_bytes: Long,
      write_bytes: Long, non_refundable_fee: Long, refundable_fee: Long,
      rent_fee: Long)

  /** One transaction: envelope + result + meta essentials. */
  case class TxModel(
      hash_hex: String,
      source_key: Array[Byte],
      source_muxed_id: Option[Long], // Some → account_muxed M-address emitted
      account_sequence: Long,
      max_fee: Long,
      fee_charged: Long,
      successful: Boolean,
      result_code: String,
      memo_type: String, // none | text | id | hash | return
      memo_text: Option[String],
      memo_id: Option[Long],
      memo_hash: Option[Array[Byte]],
      time_min: Option[Long], time_max: Option[Long],
      ledger_min: Option[Long], ledger_max: Option[Long],
      envelope_b64: String, result_b64: String, meta_b64: String,
      fee_meta_b64: String,
      signers: Seq[Array[Byte]],
      operations: Seq[OpModel],
      soroban: Option[SorobanModel] = None,
      fee_changes: Seq[BalanceChange] = Seq.empty,
      changes_after: Seq[BalanceChange] = Seq.empty,
      is_fee_bump: Boolean = false,
      fee_bump_account_key: Option[Array[Byte]] = None,
      inner_hash_hex: Option[String] = None,
      new_max_fee: Option[Long] = None)

  /** One closed ledger. */
  case class LedgerRow(
      sequence: Long,
      ledger_hash: Array[Byte],
      previous_ledger_hash: Array[Byte],
      header_b64: String,
      closed_at: Timestamp,
      total_coins: Long,
      fee_pool: Long,
      base_fee: Long,
      base_reserve: Long,
      max_tx_set_size: Long,
      protocol_version: Long,
      soroban_fee_write_1kb: Long,
      node_id_key: Array[Byte],
      signature: Array[Byte],
      bucket_list_size: Long,
      transactions: Seq[TxModel])
}
