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
    OpModel(
      op_type = ty,
      source_key = if (o % 3 == 0) None else Some(keyOf(s"op-$l-$t-$o")),
      source_muxed_id = None,
      amount_stroops = 1000000L * (o + 1) + t,
      details_json = s"""{"amount":"${(o + 1).toDouble}","op":"$ty"}""",
      result_code = "OperationResultCodeOpInner",
      trace_code = "success")
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
      operations = (0 until (t % 4) + 1).map(o => op(l, t, o)))
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
      protocol_version = 21,
      soroban_fee_write_1kb = 11800L,
      node_id_key = keyOf(s"node-${seq % 5}"),
      signature = keyOf(s"sig-$seq").take(16),
      bucket_list_size = 20_000_000_000L + seq,
      transactions = (0 until ((seq % 5) + 1).toInt).map(t => tx(seq, t)))

  def ledgers(spark: SparkSession, start: Long, end: Long): Dataset[LedgerRow] = {
    import spark.implicits._
    spark.createDataset((start to end).map(ledger))
  }
}
