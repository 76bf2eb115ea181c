package graft.model

import java.sql.Timestamp

/** Output-table row types, mirroring the reference's BigQuery-aligned schemas
  * field-for-field (names = the reference's JSON tags;
  * `/root/reference/internal/transform/schema.go:12-657`). Scala `Option`
  * stands in for null.Int/null.String/zero.Int; u32 counters widen to Long
  * exactly as the reference's parquet converter does
  * (`parquet_converter.go:4-33`). */
object Outputs {

  /** `history_ledgers` (`schema.go:13-36`). */
  case class LedgerOutput(
      sequence: Long, ledger_hash: String, previous_ledger_hash: String,
      ledger_header: String, transaction_count: Int, operation_count: Int,
      successful_transaction_count: Int, failed_transaction_count: Int,
      tx_set_operation_count: String, closed_at: Timestamp, total_coins: Long,
      fee_pool: Long, base_fee: Long, base_reserve: Long, max_tx_set_size: Long,
      protocol_version: Long, id: Long, soroban_fee_write_1kb: Long,
      node_id: String, signature: String, total_byte_size_of_bucket_list: Long)

  /** `history_transactions` (`schema.go:38-81`). */
  case class TransactionOutput(
      transaction_hash: String, ledger_sequence: Long, account: String,
      account_muxed: Option[String], account_sequence: Long, max_fee: Long,
      fee_charged: Long, operation_count: Int, tx_envelope: String,
      tx_result: String, tx_meta: String, tx_fee_meta: String,
      created_at: Timestamp, memo_type: String, memo: String,
      time_bounds: String, successful: Boolean, id: Long,
      fee_account: Option[String], fee_account_muxed: Option[String],
      inner_transaction_hash: Option[String], new_max_fee: Option[Long],
      ledger_bounds: String, min_account_sequence: Option[Long],
      min_account_sequence_age: Option[Long],
      min_account_sequence_ledger_gap: Option[Long],
      extra_signers: Seq[String], closed_at: Timestamp, resource_fee: Long,
      soroban_resources_instructions: Long, soroban_resources_read_bytes: Long,
      soroban_resources_write_bytes: Long, transaction_result_code: String,
      inclusion_fee_bid: Long, inclusion_fee_charged: Long,
      resource_fee_refund: Long, non_refundable_resource_fee_charged: Long,
      refundable_resource_fee_charged: Long, rent_fee_charged: Long,
      tx_signers: Seq[String])

  /** `history_operations` (`schema.go:131-146`; `details` kept as JSON
    * string — see SURVEY §1.2 on the details union). */
  case class OperationOutput(
      source_account: String, source_account_muxed: Option[String],
      `type`: Int, type_string: String, details: String, transaction_id: Long,
      id: Long, closed_at: Timestamp, operation_result_code: String,
      operation_trace_code: String, ledger_sequence: Long, details_json: String)

  /** `history_effects` (`schema.go:356-368`). */
  case class EffectOutput(
      address: String, address_muxed: Option[String], operation_id: Long,
      details: String, `type`: Int, type_string: String, closed_at: Timestamp,
      ledger_sequence: Long, index: Long, id: String)

  /** `history_trades` (`schema.go:283-309`). */
  case class TradeOutput(
      order: Int, ledger_closed_at: Timestamp, selling_account_address: String,
      selling_asset_code: String, selling_asset_issuer: String,
      selling_asset_type: String, selling_asset_id: Long, selling_amount: Double,
      buying_account_address: String, buying_asset_code: String,
      buying_asset_issuer: String, buying_asset_type: String,
      buying_asset_id: Long, buying_amount: Double, price_n: Long, price_d: Long,
      selling_offer_id: Option[Long], buying_offer_id: Option[Long],
      selling_liquidity_pool_id: Option[String], liquidity_pool_fee: Option[Long],
      history_operation_id: Long, trade_type: Int, rounding_slippage: Option[Long],
      seller_is_exact: Option[Boolean],
      selling_liquidity_pool_id_strkey: Option[String])

  /** `history_assets` (`schema.go:225-232`). */
  case class AssetOutput(
      asset_code: String, asset_issuer: String, asset_type: String,
      asset_id: Long, closed_at: Timestamp, ledger_sequence: Long)

  /** `accounts` (`schema.go:95-119`). */
  case class AccountOutput(
      account_id: String, balance: Double, buying_liabilities: Double,
      selling_liabilities: Double, sequence_number: Long,
      sequence_ledger: Option[Long], sequence_time: Option[Long],
      num_subentries: Long, inflation_destination: String, flags: Long,
      home_domain: String, master_weight: Int, threshold_low: Int,
      threshold_medium: Int, threshold_high: Int, sponsor: Option[String],
      num_sponsored: Long, num_sponsoring: Long, last_modified_ledger: Long,
      ledger_entry_change: Long, deleted: Boolean, closed_at: Timestamp,
      ledger_sequence: Long)

  /** `account_signers` (`schema.go:119-129`). */
  case class AccountSignerOutput(
      account_id: String, signer: String, weight: Int, sponsor: Option[String],
      last_modified_ledger: Long, ledger_entry_change: Long, deleted: Boolean,
      closed_at: Timestamp, ledger_sequence: Long)

  /** `offers` (`schema.go:256-281`). */
  case class OfferOutput(
      seller_id: String, offer_id: Long, selling_asset_type: String,
      selling_asset_code: String, selling_asset_issuer: String,
      selling_asset_id: Long, buying_asset_type: String,
      buying_asset_code: String, buying_asset_issuer: String,
      buying_asset_id: Long, amount: Double, pricen: Int, priced: Int,
      price: Double, flags: Long, last_modified_ledger: Long,
      ledger_entry_change: Long, deleted: Boolean, sponsor: Option[String],
      closed_at: Timestamp, ledger_sequence: Long)

  /** `trust_lines` (`schema.go:234-255`). */
  case class TrustlineOutput(
      ledger_key: String, account_id: String, asset_code: String,
      asset_issuer: String, asset_type: String, asset_id: Long,
      balance: Double, trust_line_limit: Long, liquidity_pool_id: String,
      buying_liabilities: Double, selling_liabilities: Double, flags: Long,
      last_modified_ledger: Long, ledger_entry_change: Long,
      sponsor: Option[String], deleted: Boolean, closed_at: Timestamp,
      ledger_sequence: Long, liquidity_pool_id_strkey: String)

  /** `liquidity_pools` (`schema.go:199-223`). */
  case class PoolOutput(
      liquidity_pool_id: String, `type`: String, fee: Long,
      trustline_count: Long, pool_share_count: Double, asset_a_type: String,
      asset_a_code: String, asset_a_issuer: String, asset_a_amount: Double,
      asset_a_id: Long, asset_b_type: String, asset_b_code: String,
      asset_b_issuer: String, asset_b_amount: Double, asset_b_id: Long,
      last_modified_ledger: Long, ledger_entry_change: Long, deleted: Boolean,
      closed_at: Timestamp, ledger_sequence: Long,
      liquidity_pool_id_strkey: String)

  /** `claimable_balances` (`schema.go:148-173`); claimant predicate is the
    * recursive XDR union serialized to JSON. */
  case class Claimant(destination: String, predicate: String)
  case class ClaimableBalanceOutput(
      balance_id: String, claimants: Seq[Claimant], asset_code: String,
      asset_issuer: String, asset_type: String, asset_id: Long,
      asset_amount: Double, sponsor: Option[String], flags: Long,
      last_modified_ledger: Long, ledger_entry_change: Long, deleted: Boolean,
      closed_at: Timestamp, ledger_sequence: Long, balance_id_strkey: String)

  /** `soroban_contract_data` (`schema.go:505-530`). */
  case class ContractDataOutput(
      contract_id: String, contract_key_type: String,
      contract_durability: String, asset_code: String, asset_issuer: String,
      asset_type: String, balance_holder: String, balance: String,
      last_modified_ledger: Long, ledger_entry_change: Long, deleted: Boolean,
      closed_at: Timestamp, ledger_sequence: Long, ledger_key_hash: String,
      key: String, key_decoded: String, `val`: String, val_decoded: String,
      contract_data_xdr: String, ledger_key_hash_base_64: String)

  /** `soroban_contract_code` (`schema.go:532-556`). */
  case class ContractCodeOutput(
      contract_code_hash: String, contract_code_ext_v: Int,
      last_modified_ledger: Long, ledger_entry_change: Long, deleted: Boolean,
      closed_at: Timestamp, ledger_sequence: Long, ledger_key_hash: String,
      n_instructions: Long, n_functions: Long, n_globals: Long,
      n_table_entries: Long, n_types: Long, n_data_segments: Long,
      n_elem_segments: Long, n_imports: Long, n_exports: Long,
      n_data_segment_bytes: Long)

  /** `ttls` (`schema.go` ttl struct). */
  case class TtlOutput(
      key_hash: String, live_until_ledger_seq: Long, last_modified_ledger: Long,
      ledger_entry_change: Long, deleted: Boolean, closed_at: Timestamp,
      ledger_sequence: Long)

  /** `contract_events` (`schema.go:614-640`). */
  case class ContractEventOutput(
      transaction_hash: String, transaction_id: Long, successful: Boolean,
      in_successful_contract_call: Boolean, contract_id: String,
      `type`: Int, type_string: String, topics: Seq[String],
      topics_decoded: Seq[String], data: String, data_decoded: String,
      contract_event_xdr: String, closed_at: Timestamp, ledger_sequence: Long)

  /** `token_transfers` (`schema.go` token transfer struct / P19). */
  case class TokenTransferOutput(
      transaction_hash: String, transaction_id: Long, operation_id: Option[Long],
      event_topic: String, from: Option[String], to: Option[String],
      asset: String, amount: String, amount_float: Double, ledger_sequence: Long,
      closed_at: Timestamp, to_muxed_id: Option[String])

  /** Orderbook star schema (`schema.go:309-348`). */
  case class DimMarket(market_id: Long, base_code: String, base_issuer: String,
      counter_code: String, counter_issuer: String)
  case class DimOffer(horizon_offer_id: Long, dim_offer_id: Long,
      market_id: Long, maker_id: Long, action: String, base_amount: Double,
      counter_amount: Double, price: Double)
  case class DimAccount(account_id: Long, address: String)
  case class FactOfferEvent(ledger_id: Long, offer_instance_id: Long)

  /** `config_settings` — ~45 scalars from the 13 config union arms
    * (`schema.go:558-612`); the long tail is kept as a map column. */
  case class ConfigSettingOutput(
      config_setting_id: Int, contract_max_size_bytes: Long,
      ledger_max_instructions: Long, tx_max_instructions: Long,
      fee_rate_per_instructions_increment: Long, contract_cost_params_cpu: String,
      contract_cost_params_mem: String, bucket_list_target_size_bytes: Long,
      last_modified_ledger: Long, ledger_entry_change: Long, deleted: Boolean,
      closed_at: Timestamp, ledger_sequence: Long)
}
