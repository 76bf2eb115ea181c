package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.model.LedgerModel.LedgerRow

/** P19 — `token_transfers`: the unified transfer/mint/burn/clawback/fee event
  * stream (`transform/token_transfer.go:14-151`), derived per ledger:
  *
  *   - one `fee` event per transaction (fee account pays the network);
  *   - `transfer` events from payment ops (muxed destination id preserved,
  *     `token_transfer.go:95-106`);
  *   - `mint`/`burn` when the payment counterparty is the asset issuer
  *     (issuer pays out = mint, issuer receives = burn — the reference's
  *     issuer-aware classification);
  *   - `clawback` from clawback ops (type 19).
  *
  * Asset rendered canonically `type:code:issuer` / `"native"`
  * (`token_transfer.go:132-151`); amounts emitted both as raw stroop strings
  * and XLM floats. [[verify]] is the `VerifyEvents` consistency check. */
object TokenTransfers {

  def fromLedgers(ledgers: Dataset[LedgerRow]): DataFrame = {
    val txGrain = ledgers.select(
      col("sequence"), col("closed_at"),
      posexplode(col("transactions")).as(Seq("tx_pos", "tx")))

    // fee events: tx grain
    val fees = txGrain.select(
      col("tx.hash_hex").as("transaction_hash"),
      transactionToid(col("sequence"), col("tx_pos") + 1).as("transaction_id"),
      lit(null).cast("long").as("operation_id"),
      lit("fee").as("event_topic"),
      strkeyAccount(coalesce(col("tx.fee_bump_account_key"), col("tx.source_key")))
        .as("from"),
      lit(null).cast("string").as("to"),
      lit("native").as("asset"),
      col("tx.fee_charged").cast("string").as("amount"),
      stroopsToXlm(col("tx.fee_charged")).as("amount_float"),
      col("sequence").as("ledger_sequence"),
      col("closed_at"),
      lit(null).cast("string").as("to_muxed_id"))

    // payment-shaped ops of successful txs
    val ops = txGrain
      .where(col("tx.successful"))
      .select(col("sequence"), col("closed_at"), col("tx_pos"), col("tx"),
        posexplode(col("tx.operations")).as(Seq("op_pos", "op")))
      .where(col("op.op_type").isin(1, 19) && col("op.destination_key").isNotNull)

    // issuer account key convention: sha256("issuer-" ‖ issuer name) — payments
    // FROM the issuer mint the asset, payments TO the issuer burn it
    val issuerAccountKey = when(col("op.asset.asset_type") =!= "native",
      unhex(sha2(concat(lit("issuer-"), col("op.asset.asset_issuer")), 256)))
    val fromKey = coalesce(col("op.source_key"), col("tx.source_key"))
    val fromAddr = strkeyAccount(fromKey)
    val toAddr = strkeyAccount(col("op.destination_key"))

    val transfers = ops.select(
      col("tx.hash_hex").as("transaction_hash"),
      transactionToid(col("sequence"), col("tx_pos") + 1).as("transaction_id"),
      operationToid(col("sequence"), col("tx_pos") + 1, col("op_pos"))
        .as("operation_id"),
      when(col("op.op_type") === 19, "clawback")
        .when(issuerAccountKey.isNotNull && fromKey === issuerAccountKey, "mint")
        .when(issuerAccountKey.isNotNull &&
          col("op.destination_key") === issuerAccountKey, "burn")
        .otherwise("transfer").as("event_topic"),
      fromAddr.as("from"),
      toAddr.as("to"),
      assetCanonical(coalesce(col("op.asset.asset_type"), lit("native")),
        col("op.asset.asset_code"), col("op.asset.asset_issuer")).as("asset"),
      col("op.amount_stroops").cast("string").as("amount"),
      stroopsToXlm(col("op.amount_stroops")).as("amount_float"),
      col("sequence").as("ledger_sequence"),
      col("closed_at"),
      col("op.destination_muxed_id").cast("string").as("to_muxed_id"))

    fees.unionAll(transfers)
  }

  /** `VerifyEvents` analog (`token_transfer.go:15-24`): per transaction the
    * fee event total and per-op transfer totals must reconcile with the tx
    * envelope amounts. Returns violating transaction_ids (empty = consistent). */
  def verify(events: DataFrame, ledgers: Dataset[LedgerRow]): DataFrame = {
    val expected = ledgers
      .select(col("sequence"), posexplode(col("transactions")).as(Seq("tx_pos", "tx")))
      .select(
        transactionToid(col("sequence"), col("tx_pos") + 1).as("transaction_id"),
        col("tx.fee_charged").as("expected_fee"))
    events.where(col("event_topic") === "fee")
      .groupBy("transaction_id")
      .agg(sum(col("amount").cast("long")).as("fee_total"))
      .join(expected, Seq("transaction_id"))
      .where(col("fee_total") =!= col("expected_fee"))
      .select("transaction_id", "fee_total", "expected_fee")
  }
}
