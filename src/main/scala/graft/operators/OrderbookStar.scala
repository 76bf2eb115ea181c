package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** P20/S8 — normalized orderbook star schema: DimMarket / DimOffer /
  * DimAccount / FactOfferEvent derived from an offer snapshot
  * (`/root/reference/internal/transform/offer_normalized.go:16-183`).
  *
  * Dim keys are FNV-64a over canonicalized natural keys; the base/counter
  * asset pair is ordered lexicographically before hashing so both sides of a
  * market map to one dim row. Dedup is a hash-aggregate (A3).
  *
  * Input contract: offer-grain DataFrame with columns
  * (offer_id, seller_id, selling_asset, buying_asset, amount, price_n,
  * price_d, ledger_sequence, deleted).
  */
object OrderbookStar {
  import GraftFunctions.fnv64a

  /** F9: deleted offers are rejected from the normalized path. */
  def liveOffers(offers: DataFrame): DataFrame = offers.filter(!col("deleted"))

  def dimMarket(offers: DataFrame): DataFrame =
    liveOffers(offers)
      .select(
        least(col("selling_asset"), col("buying_asset")).as("base_asset"),
        greatest(col("selling_asset"), col("buying_asset")).as("counter_asset"))
      .distinct()
      .withColumn("market_id", fnv64a(concat_ws("/", col("base_asset"), col("counter_asset"))))
      .select("market_id", "base_asset", "counter_asset")

  def dimAccount(offers: DataFrame): DataFrame =
    liveOffers(offers)
      .select(col("seller_id").as("address"))
      .distinct()
      .withColumn("account_id", fnv64a(col("address")))
      .select("account_id", "address")

  def dimOffer(offers: DataFrame): DataFrame =
    liveOffers(offers)
      .select(col("offer_id"), col("amount"), col("price_n"), col("price_d"))
      .distinct()
      .withColumn("dim_offer_id", fnv64a(concat_ws("|",
        col("offer_id"), col("amount"), col("price_n"), col("price_d"))))
      .select("dim_offer_id", "offer_id", "amount", "price_n", "price_d")

  def factOfferEvents(offers: DataFrame): DataFrame =
    liveOffers(offers).select(
      col("ledger_sequence"),
      fnv64a(concat_ws("/",
        least(col("selling_asset"), col("buying_asset")),
        greatest(col("selling_asset"), col("buying_asset")))).as("market_id"),
      fnv64a(col("seller_id")).as("maker_id"),
      fnv64a(concat_ws("|",
        col("offer_id"), col("amount"), col("price_n"), col("price_d"))).as("dim_offer_id"),
      GraftFunctions.priceRatio(col("price_n"), col("price_d")).as("price"),
      col("amount"))

  /** S8 batch-mode snapshot: orderbook state as of `asOfSeq` = latest
    * non-deleted state per offer with seq <= asOfSeq (one compaction agg). */
  def snapshotAsOf(offerChanges: DataFrame, asOfSeq: Long): DataFrame =
    ChangeCompaction.snapshot(
      offerChanges.where(col("ledger_sequence") <= asOfSeq),
      keyCols = Seq("offer_id"),
      orderCols = Seq("ledger_sequence", "change_order"))
}
