package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-stream compaction: last state per ledger-entry key.
  *
  * Reference: `ChangeCompactor` applies changes in order and keeps the final
  * state per key within a ledger/batch (`/root/reference/internal/input/
  * changes.go:104-151`); the orderbook path keeps a running snapshot
  * (`orderbooks.go:122-266`).
  *
  * Spark-first design: a single hash aggregation `groupBy(key).agg(max_by(state,
  * ord))` — NOT a window. `max_by` does map-side partial aggregation, so at
  * 100 TB the shuffle carries one pre-compacted row per (partition, key) instead
  * of every change; a window (`row_number over partition by key order by ord`)
  * would shuffle and sort the full change stream. The aggregation spills, skew
  * on hot keys is handled by AQE, and the result partitioning by `key` can be
  * reused by a downstream join on the same key.
  */
object ChangeCompaction {

  /** Keep the latest row per key, "latest" = max of orderCols lexicographically.
    *
    * @param df        change-grain DataFrame
    * @param keyCols   ledger-entry key (e.g. account_id / offer_id / ledger_key)
    * @param orderCols application order (e.g. ledger_sequence, change_order) —
    *                  must be non-null and totally ordered within a key
    */
  def latestByKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    // nested key paths (e.g. "offer.offer_id") surface as dot-free columns
    val keyNames = keyCols.map(_.replace('.', '_'))
    val ord = struct(orderCols.map(col): _*)
    val payload = struct(df.columns.filterNot(keyCols.contains).map(col): _*)
    df.groupBy(keyCols.zip(keyNames).map { case (k, n) => col(k).as(n) }: _*)
      .agg(max_by(payload, ord).as("__latest"))
      .select(keyNames.map(col) :+ col("__latest.*"): _*)
  }

  /** Per-batch compaction: latest state per key within each `batchSize`-ledger
    * batch (the change-export unit, default 64 = one checkpoint). Emits
    * `batch_id` for `write.partitionBy("batch_id")` idempotent batch files. */
  def compactBatches(
      df: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      orderCols: Seq[String],
      batchSize: Int = 64): DataFrame = {
    val withBatch = df.withColumn("batch_id", floor(col(seqCol) / batchSize))
    latestByKey(withBatch, keyCols :+ "batch_id", orderCols)
  }

  /** Deleted-entry handling: compact, then optionally drop rows whose final
    * state is a delete (snapshot semantics vs change-log semantics). */
  def snapshot(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      deletedCol: String = "deleted"): DataFrame =
    latestByKey(df, keyCols, orderCols).filter(!col(deletedCol))
}
