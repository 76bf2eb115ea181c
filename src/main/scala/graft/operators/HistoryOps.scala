package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** The history-table pipeline: range-scan ledgers → explode to tx/op grain →
  * project analytics columns. Mirrors the reference's core export shape
  * (`/root/reference/internal/input/{ledgers,transactions,operations}.go`,
  * `internal/transform/{ledger,transaction,operation}.go`).
  *
  * Scale design: ledger counts (A1) are computed per-row with higher-order
  * functions over the nested tx array — zero shuffle, fully codegen'd; the
  * reference iterates every tx imperatively. Explosions are narrow (no
  * shuffle); TOIDs are pure bit expressions; application order is the
  * position in the (already sorted) nested array, so no window is needed.
  */
object HistoryOps {

  /** Range scan [start, end] on the ledger sequence — the reference's only
    * scan predicate; prunes partitions/row-groups when the source is
    * partitioned or sorted by sequence. */
  def scanRange(ledgers: DataFrame, start: Long, end: Long): DataFrame =
    ledgers.where(col("ledger_sequence").between(start, end))

  /** P1/A1 — `history_ledgers`: per-ledger header + aggregated tx/op counts,
    * computed intra-row from the nested array (no shuffle):
    * reference `transform/ledger.go:120-153`. */
  def historyLedgers(ledgers: DataFrame): DataFrame =
    ledgers.select(
      col("ledger_sequence"),
      ledgerToid(col("ledger_sequence")).as("ledger_id"),
      col("closed_at"),
      // `transaction_count` EXCLUDES failed txs (`ledger.go:149`:
      // txCount - failedTxCount; real goldens show 46 with 11 failed)
      size(filter(col("transactions"), t => t("successful")))
        .cast("long").as("transaction_count"),
      size(filter(col("transactions"), t => t("successful")))
        .cast("long").as("successful_transaction_count"),
      size(filter(col("transactions"), t => !t("successful")))
        .cast("long").as("failed_transaction_count"),
      // one op per tx in the fixture: ops over successful txs only vs all txs
      // (the latter string-typed in the reference schema, `schema.go:22`)
      size(filter(col("transactions"), t => t("successful")))
        .cast("long").as("operation_count"),
      size(col("transactions")).cast("long")
        .cast("string").as("tx_set_operation_count"),
      aggregate(col("transactions"), lit(0L), (acc, t) => acc + t("fee_charged"))
        .as("total_fee_charged"))

  /** S2/P2 — `history_transactions`: posexplode the sorted tx array;
    * application order = 1-based array position; TOIDs as bit expressions. */
  def historyTransactions(ledgers: DataFrame): DataFrame =
    ledgers
      .select(col("ledger_sequence"), col("closed_at"),
        posexplode(col("transactions")).as(Seq("pos", "tx")))
      .select(
        transactionToid(col("ledger_sequence"), col("pos") + 1).as("transaction_id"),
        col("ledger_sequence"),
        (col("pos") + 1).cast("long").as("application_order"),
        col("tx.fee_charged").as("fee_charged"),
        col("tx.successful").as("successful"),
        col("tx.op_type").as("op_type"),
        col("tx.amount").as("amount"),
        col("tx.supp_key").as("source_account_key"),
        col("tx.part_key").as("part_key"),
        col("tx.line_no").as("line_no"),
        col("closed_at"))

  /** S3/P3 — op grain (one op per tx in the fixture; op_index 0-based in
    * storage, +1 in the TOID, reference `operation.go:32`). */
  def historyOperations(transactions: DataFrame): DataFrame =
    transactions.select(
      operationToid(col("ledger_sequence"), col("application_order"), lit(0L))
        .as("operation_id"),
      col("transaction_id"),
      col("ledger_sequence"),
      col("application_order"),
      col("op_type"),
      col("amount"),
      col("part_key"),
      col("source_account_key").as("source_account"),
      col("successful").as("transaction_successful"))

  /** S4/F1 — trade-producing ops: type whitelist AND successful tx
    * (`input/trades.go:64,89-104`). */
  val TradeOpTypes: Seq[Int] = Seq(3, 4, 5) // fixture analog of the 5 trade op types
  def tradeOps(ops: DataFrame): DataFrame =
    ops.filter(col("op_type").isin(TradeOpTypes: _*) && col("transaction_successful"))

  /** S5/F2 — payment-shaped ops (asset extraction source, `input/assets.go:42`). */
  val PaymentOpTypes: Seq[Int] = Seq(1, 3)
  def paymentOps(ops: DataFrame): DataFrame =
    ops.filter(col("op_type").isin(PaymentOpTypes: _*))

  /** A2/P6 — dedup by first-seen id (`cmd/export_assets.go:39-58`):
    * deterministic keep-lowest-`orderCol` via min_by (map-side combinable),
    * not dropDuplicates (which keeps an arbitrary row). */
  def dedupFirstSeen(df: DataFrame, idCol: String, orderCol: String): DataFrame = {
    val payload = struct(df.columns.filterNot(_ == idCol).map(col): _*)
    df.groupBy(col(idCol))
      .agg(min_by(payload, col(orderCol)).as("__first"))
      .select(col(idCol), col("__first.*"))
  }

  /** §3.3 — `get_ledger_range_from_times`: the reference binary-searches a
    * history archive over HTTP for the ledgers bracketing a time window
    * (`cmd/get_ledger_range_from_times.go:26-83`,
    * `internal/input/ledger_range.go:101-194`). Once ledgers are a table the
    * same answer is one filtered min/max aggregate — map-side combinable,
    * no search, and the closed_at filter prunes partitions when the table
    * is date-partitioned. `bucket` generalizes the utility to a whole
    * time-bucket → ledger-range map in the same single shuffle (the CLI
    * passes a constant bucket and reads the one row back). */
  def ledgerRangeForTimes(ledgers: DataFrame, startTime: Column,
      endTime: Column, bucket: Column = lit("range")): DataFrame =
    ledgers
      .where(col("closed_at").between(startTime, endTime))
      .groupBy(bucket.as("bucket"))
      .agg(
        min("ledger_sequence").as("start_ledger"),
        max("ledger_sequence").as("end_ledger"),
        count(lit(1)).as("ledger_count"))
}
