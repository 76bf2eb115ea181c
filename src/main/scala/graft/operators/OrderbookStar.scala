package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** P20/S8 — normalized orderbook star schema: DimMarket / DimOffer /
  * DimAccount / FactOfferEvent derived from an offer snapshot, matching the
  * reference's output structs field-for-field
  * (`/root/reference/internal/transform/offer_normalized.go:16-183`,
  * `schema.go:310-341`).
  *
  * Laws (all verified against the reference's own golden NDJSON in
  * ReferenceGoldenSpec):
  *  - assets render as `code:issuer` (`native:` for native) and the pair is
  *    sorted lexicographically before hashing, so both sides of a market map
  *    to one dim row (`extractAssets`/`extractDimMarket`,
  *    offer_normalized.go:60-137);
  *  - `market_id`  = FNV-64a(assets[0] + "/" + assets[1]);
  *  - `account_id` = FNV-64a(seller address) (`extractDimAccount`, :171-183);
  *  - `dim_offer_id` = FNV-64a(sprintf("%d/%f/%f", offer_id, amount, price))
  *    — Go `%f` is fixed 6-decimal, same as java.util.Formatter's, so
  *    `format_string` reproduces the exact hash input
  *    (`extractDimOffer`, :140-168);
  *  - `action` is "s" when the selling asset sorts first, else "b";
  *  - the fact row is just (ledger_id, offer_instance_id=dim_offer_id) —
  *    the dims carry all attributes (schema.go:327-331).
  *
  * Input contract: the offer grain `ChangeTransforms.offers` emits —
  * (seller_id, offer_id, selling_asset_{type,code,issuer},
  * buying_asset_{type,code,issuer}, amount, pricen, priced, price,
  * ledger_sequence, deleted).
  *
  * Scale shape: every dim is a map-side-combinable hash-aggregate dedup
  * (A3) over pure per-row expressions — one shuffle each, no joins; the
  * fact table is map-only.
  */
object OrderbookStar {
  import GraftFunctions.fnv64a

  /** `code:issuer`, or `native:` — `extractAssets`
    * (offer_normalized.go:60-99). */
  private def assetStr(ty: Column, code: Column, issuer: Column): Column =
    when(ty === "native", lit("native:"))
      .otherwise(concat_ws(":", code, issuer))

  private val sellStr = assetStr(col("selling_asset_type"),
    col("selling_asset_code"), col("selling_asset_issuer"))
  private val buyStr = assetStr(col("buying_asset_type"),
    col("buying_asset_code"), col("buying_asset_issuer"))
  // sort.Strings of the [buying, selling] pair == least/greatest
  private val asset0 = least(sellStr, buyStr)
  private val asset1 = greatest(sellStr, buyStr)
  private val marketId = fnv64a(concat_ws("/", asset0, asset1))
  private val dimOfferId = fnv64a(
    format_string("%d/%f/%f", col("offer_id"), col("amount"), col("price")))

  /** F9: deleted offers are rejected from the normalized path
    * (offer_normalized.go:24-26). */
  def liveOffers(offers: DataFrame): DataFrame = offers.filter(!col("deleted"))

  /** `dim_markets` — base is the lexicographically-first asset
    * (offer_normalized.go:102-137). */
  def dimMarket(offers: DataFrame): DataFrame =
    liveOffers(offers)
      .select(marketId.as("market_id"),
        split_part(asset0, lit(":"), lit(1)).as("base_code"),
        split_part(asset0, lit(":"), lit(2)).as("base_issuer"),
        split_part(asset1, lit(":"), lit(1)).as("counter_code"),
        split_part(asset1, lit(":"), lit(2)).as("counter_issuer"))
      .distinct()

  /** `dim_accounts` (offer_normalized.go:171-183). */
  def dimAccount(offers: DataFrame): DataFrame =
    liveOffers(offers)
      .select(fnv64a(col("seller_id")).as("account_id"),
        col("seller_id").as("address"))
      .distinct()

  /** `dim_offers` (offer_normalized.go:140-168, schema.go:316-325). */
  def dimOffer(offers: DataFrame): DataFrame =
    liveOffers(offers)
      .select(
        col("offer_id").as("horizon_offer_id"),
        dimOfferId.as("dim_offer_id"),
        marketId.as("market_id"),
        fnv64a(col("seller_id")).as("maker_id"),
        when(sellStr === asset0, lit("s")).otherwise(lit("b")).as("action"),
        col("amount").cast("double").as("base_amount"),
        (col("amount") * col("price")).cast("double").as("counter_amount"),
        col("price").cast("double").as("price"))
      .distinct()

  /** `fact_offer_events` (schema.go:327-331): the ledger the snapshot was
    * taken at plus the offer-instance FK into `dim_offers`. */
  def factOfferEvents(offers: DataFrame): DataFrame =
    liveOffers(offers).select(
      col("ledger_sequence").cast("long").as("ledger_id"),
      dimOfferId.as("offer_instance_id"))

  /** S8 batch-mode snapshot: orderbook state as of `asOfSeq` = latest
    * non-deleted state per offer with seq <= asOfSeq (one compaction agg). */
  def snapshotAsOf(offerChanges: DataFrame, asOfSeq: Long): DataFrame =
    ChangeCompaction.snapshot(
      offerChanges.where(col("ledger_sequence") <= asOfSeq),
      keyCols = Seq("offer_id"),
      orderCols = Seq("ledger_sequence", "change_order"))
}
