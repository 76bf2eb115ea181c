package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P4 — effect generation: each operation fans out to 0..N effect rows,
  * only for successful transactions (reference `transform/effects.go:23-166`,
  * 50+ effect types; effect id = `"{opID}-{index}"`, `effects.go:158-163`).
  *
  * Spark-first shape: build the per-op effect array with pure column
  * expressions (a `when`-chain per effect slot, nulls filtered), then one
  * narrow `posexplode` — a generator with no shuffle and no UDF, in contrast
  * to the reference's per-row imperative switch. */
object Effects {

  /** Fixture effect law (stands in for the 26-op-type case analysis):
    *   - payment-shaped ops (1,3): `account_credited` + `account_debited`
    *   - op 0: `account_created`;  op 2: `signer_updated`
    *   - anything else: `op_applied`
    * Input contract: op grain with (operation_id, op_type, amount,
    * source_account, transaction_successful). */
  def fromOperations(ops: DataFrame): DataFrame = {
    def eff(effectType: Column, amount: Column): Column =
      struct(effectType.as("effect_type"), amount.as("amount"))

    val effectsArr =
      when(col("op_type").isin(1, 3), array(
        eff(lit("account_credited"), col("amount")),
        eff(lit("account_debited"), col("amount"))))
      .when(col("op_type") === 0, array(eff(lit("account_created"), col("amount"))))
      .when(col("op_type") === 2, array(eff(lit("signer_updated"), lit(null).cast("double"))))
      .otherwise(array(eff(lit("op_applied"), lit(null).cast("double"))))

    ops
      .filter(col("transaction_successful")) // F3: successful txs only
      .select(col("operation_id"), col("op_type"), col("source_account"),
        posexplode(effectsArr).as(Seq("pos", "e")))
      .select(
        concat(col("operation_id").cast("string"), lit("-"),
          (col("pos") + 1).cast("string")).as("effect_id"),
        col("operation_id"),
        (col("pos") + 1).cast("long").as("effect_index"),
        col("e.effect_type").as("effect_type"),
        col("e.amount").as("amount"),
        col("source_account").as("account"))
  }
}
