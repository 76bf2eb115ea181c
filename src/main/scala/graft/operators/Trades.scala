package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** P5 — trade extraction: each trade-producing operation flat-maps to one row
  * per claimed offer (claim atom), with price from the pre-state offer entry
  * and synthetic buying-offer ids for path payments
  * (reference `transform/trade.go:21-162`, `extractClaimedOffers:164-262`,
  * `toid/synt_offer_id.go:28-34`).
  *
  * Fixture claim-atom law: a trade op claims `part_key % 2 + 1` atoms; the
  * claimed amount divides evenly across atoms; odd-indexed atoms take a
  * synthetic (bit-62) buying offer id, mirroring offers that never existed
  * on-chain. Zero-amount trades are dropped (F7, `trade.go:69-72`). */
object Trades {

  /** Input: trade-op grain (operation_id, ledger_sequence, application_order,
    * op_type, amount, part_key via tx fixture). Output: atom grain. */
  def fromTradeOps(tradeOps: DataFrame): DataFrame = {
    val nAtoms = expr("part_key % 2 + 1")
    tradeOps
      .select(
        col("operation_id"), col("ledger_sequence"), col("application_order"),
        col("amount"), nAtoms.as("n_atoms"),
        posexplode(sequence(lit(0), expr("part_key % 2")))
          .as(Seq("atom_index", "atom")))
      .select(
        col("operation_id"),
        col("atom_index").cast("long").as("atom_index"),
        (col("amount") / col("n_atoms")).as("selling_amount"),
        when(col("atom_index") % 2 === 1,
          GraftFunctions.syntheticOfferId(col("ledger_sequence"),
            col("application_order"), lit(0L)))
          .otherwise(col("operation_id")).as("buying_offer_id"),
        (col("atom_index") % 2 === 0).as("seller_is_exact"))
      .filter(col("selling_amount") > 0) // F7
  }
}
