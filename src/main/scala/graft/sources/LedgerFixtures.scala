package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic nested-ledger fixture built from the driver's synthetic
  * TPC-H-ish tables. Models the reference's source grain — one row per ledger
  * holding the header plus a nested array of transactions — so the history
  * operators (explode → project) can be exercised and oracle-checked without
  * real XDR data.
  *
  * Mapping (stable; oracle SQL re-derives it relationally):
  *   - ledger_sequence = o_orderkey (orders)
  *   - closed_at       = o_orderdate
  *   - transactions[]  = that order's lineitems, sorted by
  *     (line_no, part_key, supp_key, amount, fee_charged) — full lineitem rows
  *     are unique, so this is a total order; transaction application order
  *     (1-based) = position in the sorted array (assigned at explode time).
  *   - fee_charged = round(l_extendedprice * 100) as long (stroop-ish)
  *   - successful  = l_returnflag != 'R'
  *   - op_type     = l_partkey % 8 (one operation per transaction)
  */
object LedgerFixtures {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Events with the timestamp exposed as epoch-nanos long `ts` — the
    * contract every downstream consumer (and the DuckDB oracle's
    * `epoch_us(ts)`) assumes. The driver's generator has emitted the parquet
    * column as both INT64 TIMESTAMP(NANOS) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) across regenerations, so normalize by schema:
    *   - NANOS-typed files read as LongType under `nanosAsLong` → pass-through
    *   - MICROS-typed files read as a timestamp → `unix_micros(ts) * 1000`.
    * `inferTimestampNTZ` is disabled so the un-adjusted micros column reads
    * as TimestampType holding the stored value as a UTC instant; the
    * defensive cast keeps the NTZ case correct too (sessions here run UTC). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }

  /** Session-scoped decode-once memo. The nested-ledger build is the shared
    * upstream of every history query (a shuffle for the per-ledger
    * `collect_list` plus the orders join); recomputing it per export is
    * wasted work. This mirrors the production architecture at 100 TB — the
    * XDR decode runs ONCE into a materialized nested table and every export
    * reads that — so the fixture does the same: first caller persists
    * (memory-then-disk), later queries reuse the exchange-free cached scan.
    * Keyed by (session, dir) so test sessions never see a stopped session's
    * blocks. */
  private val ledgerCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Nested ledgers: (ledger_sequence, closed_at, ledger_status, transactions[]). */
  def ledgers(spark: SparkSession, sfDir: String): DataFrame =
    ledgerCache.computeIfAbsent((spark, sfDir), _ =>
      buildLedgers(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  private def buildLedgers(spark: SparkSession, sfDir: String): DataFrame = {
    val li = table(spark, sfDir, "lineitem")
    val orders = table(spark, sfDir, "orders")

    val txs = li.select(
      col("l_orderkey").as("ledger_sequence"),
      struct(
        col("l_linenumber").cast("long").as("line_no"),
        col("l_partkey").as("part_key"),
        col("l_suppkey").as("supp_key"),
        col("l_quantity").as("amount"),
        round(col("l_extendedprice") * 100).cast("long").as("fee_charged"),
        (col("l_returnflag") =!= "R").as("successful"),
        pmod(col("l_partkey"), lit(8)).cast("int").as("op_type")
      ).as("tx"))

    val nested = txs
      .groupBy("ledger_sequence")
      .agg(sort_array(collect_list(col("tx"))).as("transactions"))

    nested.join(
      orders.select(
        col("o_orderkey").as("ledger_sequence"),
        col("o_orderdate").as("closed_at"),
        col("o_orderstatus").as("ledger_status")),
      Seq("ledger_sequence"))
  }

  /** The shared oracle-SQL prefix reconstructing the tx grain relationally —
    * MUST stay in lockstep with `ledgers` above. */
  val txBaseSql: String =
    """WITH tx AS (
      |  SELECT l_orderkey AS ledger_sequence,
      |         row_number() OVER (PARTITION BY l_orderkey
      |           ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity,
      |                    CAST(round(l_extendedprice*100) AS BIGINT)) AS tx_order,
      |         CAST(round(l_extendedprice*100) AS BIGINT) AS fee_charged,
      |         l_returnflag <> 'R' AS successful,
      |         CAST(l_partkey % 8 AS INT) AS op_type,
      |         l_quantity AS amount,
      |         l_suppkey AS source_account_key,
      |         l_partkey AS part_key,
      |         CAST(l_linenumber AS BIGINT) AS line_no
      |  FROM lineitem)""".stripMargin
}
