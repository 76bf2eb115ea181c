package graft.model

import java.sql.Timestamp

/** The decoded change grain: one row per ledger-entry change (Pre/Post state
  * pair), the input of the nine `export_ledger_entry_changes` projections
  * (`internal/input/changes.go:20-30`; Pre/Post unwrap semantics in
  * `internal/utils/main.go:836-845`: deleted ⇔ Post == nil, and field values
  * come from Post when present else Pre). The decoder emits the unwrapped
  * final state plus the `deleted` flag and change metadata; entry-type
  * payloads are nested optional structs, exactly one non-null per row. */
object ChangeModel {

  case class AccountState(
      account_key: Array[Byte], balance_stroops: Long,
      buying_liabilities_stroops: Long, selling_liabilities_stroops: Long,
      sequence_number: Long, sequence_ledger: Option[Long],
      sequence_time: Option[Long], num_subentries: Long,
      inflation_destination_key: Option[Array[Byte]], flags: Long,
      home_domain: String, master_weight: Int, threshold_low: Int,
      threshold_medium: Int, threshold_high: Int,
      sponsor_key: Option[Array[Byte]], num_sponsored: Long,
      num_sponsoring: Long,
      signers: Seq[SignerState])

  case class SignerState(signer_key: Array[Byte], weight: Int,
      sponsor_key: Option[Array[Byte]])

  case class OfferState(
      seller_key: Array[Byte], offer_id: Long,
      selling_asset: AssetRef, buying_asset: AssetRef,
      amount_stroops: Long, price_n: Int, price_d: Int, flags: Long,
      sponsor_key: Option[Array[Byte]])

  case class TrustlineState(
      account_key: Array[Byte], asset: AssetRef,
      balance_stroops: Long, limit_stroops: Long,
      buying_liabilities_stroops: Long, selling_liabilities_stroops: Long,
      flags: Long, sponsor_key: Option[Array[Byte]],
      liquidity_pool_id: Option[Array[Byte]])

  case class AssetRef(asset_type: String, asset_code: String, asset_issuer: String)

  /** One change row. `entry_type` selects which payload is set. */
  case class ChangeRow(
      ledger_sequence: Long,
      closed_at: Timestamp,
      change_order: Long, // application order within the ledger
      ledger_entry_change: Long, // 0=created 1=updated 2=removed (reference enum)
      entry_type: String, // account | offer | trustline | ...
      deleted: Boolean,
      last_modified_ledger: Long,
      account: Option[AccountState],
      offer: Option[OfferState],
      trustline: Option[TrustlineState],
      // the PRE-state entry sponsor, when the pre image existed and was
      // sponsored — sponsorship effects classify on pre/post sponsor
      // presence, not on the entry change kind (effects.go:296-317)
      pre_sponsor_key: Option[Array[Byte]] = None)
}
