package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import graft.model.LedgerModel.LedgerRow

/** The real history-table transforms over the decoded ledger model
  * (`Dataset[LedgerRow]`) — P1/P2/P3 with the reference's exact output
  * columns (`transform/{ledger,transaction,operation}.go`). Everything is
  * column algebra over the nested structs: counts are intra-row higher-order
  * functions, ids are bit expressions, address rendering is the native strkey
  * expression; the only explode is the grain change itself. */
object StellarTransforms {

  /** Go's `xdr.MemoType.String()` names (`transaction.go:74-89`). */
  private val memoTypeName = typedLit(Map(
    "none" -> "MemoTypeMemoNone", "text" -> "MemoTypeMemoText",
    "id" -> "MemoTypeMemoId", "hash" -> "MemoTypeMemoHash",
    "return" -> "MemoTypeMemoReturn"))

  /** The 26-way operation type map (`operation.go:103-166`). */
  val operationTypeNames: Map[Int, String] = Map(
    0 -> "create_account", 1 -> "payment", 2 -> "path_payment_strict_receive",
    3 -> "manage_sell_offer", 4 -> "create_passive_sell_offer",
    5 -> "set_options", 6 -> "change_trust", 7 -> "allow_trust",
    8 -> "account_merge", 9 -> "inflation", 10 -> "manage_data",
    11 -> "bump_sequence", 12 -> "manage_buy_offer",
    13 -> "path_payment_strict_send", 14 -> "create_claimable_balance",
    15 -> "claim_claimable_balance", 16 -> "begin_sponsoring_future_reserves",
    17 -> "end_sponsoring_future_reserves", 18 -> "revoke_sponsorship",
    19 -> "clawback", 20 -> "clawback_claimable_balance",
    21 -> "set_trust_line_flags", 22 -> "liquidity_pool_deposit",
    23 -> "liquidity_pool_withdraw", 24 -> "invoke_host_function",
    25 -> "extend_footprint_ttl", 26 -> "restore_footprint")
  private val opTypeNameCol = typedLit(operationTypeNames)

  /** P1 — `history_ledgers` with the reference's exact columns. */
  def historyLedgers(ledgers: Dataset[LedgerRow]): DataFrame =
    ledgers.select(
      col("sequence"),
      lower(hex(col("ledger_hash"))).as("ledger_hash"),
      lower(hex(col("previous_ledger_hash"))).as("previous_ledger_hash"),
      col("header_b64").as("ledger_header"),
      size(col("transactions")).as("transaction_count"),
      aggregate(filter(col("transactions"), t => t("successful")),
        lit(0), (acc, t) => acc + size(t("operations"))).as("operation_count"),
      size(filter(col("transactions"), t => t("successful")))
        .as("successful_transaction_count"),
      size(filter(col("transactions"), t => !t("successful")))
        .as("failed_transaction_count"),
      aggregate(col("transactions"), lit(0), (acc, t) => acc + size(t("operations")))
        .cast("string").as("tx_set_operation_count"),
      col("closed_at"),
      col("total_coins"), col("fee_pool"), col("base_fee"), col("base_reserve"),
      col("max_tx_set_size"), col("protocol_version"),
      ledgerToid(col("sequence")).as("id"),
      col("soroban_fee_write_1kb"),
      strkeyAccount(col("node_id_key")).as("node_id"),
      base64NoWrap(col("signature")).as("signature"),
      col("bucket_list_size").as("total_byte_size_of_bucket_list"))

  /** P2 — `history_transactions`: explode + memo demux, bounds intervals,
    * muxed addresses, TOID ids, and the Soroban fee decomposition
    * (`transaction.go:131-191`): inclusion fee bid = envelope fee − resource
    * fee; inclusion fee charged from the fee-account balance diff in fee meta
    * (J4, intra-row lookup); refund from TxChangesAfter; rent/refundable
    * split from SorobanMeta; P20 fee-bump bug workaround for protocol < 21
    * (`transaction.go:186-190`). */
  def historyTransactions(ledgers: Dataset[LedgerRow]): DataFrame = {
    val exploded = ledgers.select(
      col("sequence"), col("closed_at"), col("protocol_version"),
      posexplode(col("transactions")).as(Seq("pos", "tx")))

    // max==0 → open interval applies ONLY to time bounds (`transaction.go`
    // blanks MaxTime==0); ledger bounds render "[n,0)" verbatim
    def bounds(minC: String, maxC: String, blankZeroMax: Boolean): org.apache.spark.sql.Column =
      when(col(minC).isNull && col(maxC).isNull, lit(""))
        .otherwise(GraftFunctions.intervalString(
          col(minC),
          if (blankZeroMax)
            when(col(maxC) === 0L, lit(null).cast("long")).otherwise(col(maxC))
          else col(maxC)))

    // J4: first fee-meta balance change of the fee account (intra-row)
    val feeKey = coalesce(col("tx.fee_bump_account_key"), col("tx.source_key"))
    def balanceOf(changesCol: String): Column =
      get(filter(col(changesCol), c => c("account_key") === feeKey), lit(0))
    val feeChange = balanceOf("tx.fee_changes")
    val afterChange = balanceOf("tx.changes_after")
    val resourceFee = coalesce(col("tx.soroban.resource_fee"), lit(0L))
    val initialFeeCharged =
      coalesce(feeChange("balance_before") - feeChange("balance_after"), lit(0L))
    val refund = coalesce(
      afterChange("balance_after") - afterChange("balance_before"), lit(0L))
    // P20 fee-bump bug (core#4188): recompute feeCharged for pre-21 bumps
    val feeCharged =
      when(col("protocol_version") < 21 && col("tx.is_fee_bump") &&
        col("tx.soroban").isNotNull, resourceFee - refund)
        .otherwise(col("tx.fee_charged"))

    exploded.select(
      col("tx.hash_hex").as("transaction_hash"),
      col("sequence").as("ledger_sequence"),
      strkeyAccount(col("tx.source_key")).as("account"),
      when(col("tx.source_muxed_id").isNotNull,
        strkeyMuxed(col("tx.source_key"), col("tx.source_muxed_id")))
        .as("account_muxed"),
      col("tx.account_sequence").as("account_sequence"),
      col("tx.max_fee").as("max_fee"),
      feeCharged.as("fee_charged"),
      size(col("tx.operations")).as("operation_count"),
      col("tx.envelope_b64").as("tx_envelope"),
      col("tx.result_b64").as("tx_result"),
      col("tx.meta_b64").as("tx_meta"),
      col("tx.fee_meta_b64").as("tx_fee_meta"),
      col("closed_at").as("created_at"),
      element_at(memoTypeName, col("tx.memo_type")).as("memo_type"),
      coalesce(
        col("tx.memo_text"),
        col("tx.memo_id").cast("string"),
        base64NoWrap(col("tx.memo_hash")),
        lit("")).as("memo"),
      bounds("tx.time_min", "tx.time_max", blankZeroMax = true).as("time_bounds"),
      col("tx.successful").as("successful"),
      transactionToid(col("sequence"), col("pos") + 1).as("id"),
      when(col("tx.is_fee_bump"), strkeyAccount(feeKey)).as("fee_account"),
      col("tx.inner_hash_hex").as("inner_transaction_hash"),
      col("tx.new_max_fee").as("new_max_fee"),
      bounds("tx.ledger_min", "tx.ledger_max", blankZeroMax = false)
        .as("ledger_bounds"),
      col("closed_at"),
      resourceFee.as("resource_fee"),
      coalesce(col("tx.soroban.instructions"), lit(0L))
        .as("soroban_resources_instructions"),
      coalesce(col("tx.soroban.read_bytes"), lit(0L))
        .as("soroban_resources_read_bytes"),
      coalesce(col("tx.soroban.write_bytes"), lit(0L))
        .as("soroban_resources_write_bytes"),
      col("tx.result_code").as("transaction_result_code"),
      when(col("tx.soroban").isNotNull, col("tx.max_fee") - resourceFee)
        .otherwise(lit(0L)).as("inclusion_fee_bid"),
      when(col("tx.soroban").isNotNull, initialFeeCharged - resourceFee)
        .otherwise(lit(0L)).as("inclusion_fee_charged"),
      when(col("tx.soroban").isNotNull, refund).otherwise(lit(0L))
        .as("resource_fee_refund"),
      coalesce(col("tx.soroban.non_refundable_fee"), lit(0L))
        .as("non_refundable_resource_fee_charged"),
      coalesce(col("tx.soroban.refundable_fee"), lit(0L))
        .as("refundable_resource_fee_charged"),
      coalesce(col("tx.soroban.rent_fee"), lit(0L)).as("rent_fee_charged"),
      transform(col("tx.signers"), k => strkeyAccount(k)).as("tx_signers"))
  }

  /** P3 — `history_operations`: op grain with source fallback, type names,
    * op-index+1 TOIDs. The `details` union is a WIDE NULLABLE STRUCT
    * (SURVEY §1.2 option (a), BigQuery's own shape) — queryable columns,
    * prunable by Parquet, with `details` additionally rendered to JSON for
    * parity with the reference's map-typed field; the decoder's raw
    * passthrough stays as `details_json`. */
  def historyOperations(ledgers: Dataset[LedgerRow]): DataFrame = {
    val paymentish = col("op.op_type").isin(0, 1, 2, 8, 13, 19)
    val detailsStruct = struct(
      when(paymentish, stroopsToXlm(col("op.amount_stroops"))).as("amount"),
      when(col("op.destination_key").isNotNull,
        strkeyAccount(col("op.destination_key"))).as("destination"),
      when(col("op.destination_muxed_id").isNotNull,
        strkeyMuxed(col("op.destination_key"), col("op.destination_muxed_id")))
        .as("destination_muxed"),
      col("op.asset.asset_type").as("asset_type"),
      when(col("op.asset.asset_type") =!= "native", col("op.asset.asset_code"))
        .as("asset_code"),
      when(col("op.asset.asset_type") =!= "native", col("op.asset.asset_issuer"))
        .as("asset_issuer"),
      when(size(col("op.claim_atoms")) > 0, size(col("op.claim_atoms")))
        .as("n_claim_atoms"),
      when(size(col("op.claim_atoms")) > 0,
        aggregate(col("op.claim_atoms"), lit(0L),
          (acc, a) => acc + a("amount_sold_stroops"))).as("total_sold_stroops"))

    ledgers
      .select(col("sequence"), col("closed_at"),
        posexplode(col("transactions")).as(Seq("tx_pos", "tx")))
      .select(col("sequence"), col("closed_at"), col("tx_pos"), col("tx"),
        posexplode(col("tx.operations")).as(Seq("op_pos", "op")))
      .select(
        strkeyAccount(coalesce(col("op.source_key"), col("tx.source_key")))
          .as("source_account"),
        when(col("op.source_key").isNull && col("tx.source_muxed_id").isNotNull,
          strkeyMuxed(col("tx.source_key"), col("tx.source_muxed_id")))
          .as("source_account_muxed"),
        col("op.op_type").as("type"),
        element_at(opTypeNameCol, col("op.op_type")).as("type_string"),
        detailsStruct.as("details_struct"),
        to_json(detailsStruct, Map("ignoreNullFields" -> "true")).as("details"),
        transactionToid(col("sequence"), col("tx_pos") + 1).as("transaction_id"),
        operationToid(col("sequence"), col("tx_pos") + 1, col("op_pos")).as("id"),
        col("closed_at"),
        col("op.result_code").as("operation_result_code"),
        col("op.trace_code").as("operation_trace_code"),
        col("sequence").as("ledger_sequence"),
        col("op.details_json").as("details_json"))
  }
}
