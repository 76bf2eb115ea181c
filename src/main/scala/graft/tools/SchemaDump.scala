package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.{LedgerFixtures, StellarFixture}

/** Dumps the output schema of every table family the reference publishes
  * golden NDJSON for (under /root/reference/testdata), as one JSON object
  * `{family: {column: sparkType}}` — the diffing input for
  * ReferenceGoldenSpec work. */
object SchemaDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("schema-dump")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val fx = StellarFixture.ledgers(spark, 1000, 1004)
    val changes = StellarFixture.changes(spark, 1000, 1004, includeTrustlines = true)
    def tbl(n: String) = LedgerFixtures.table(spark, sfDir, n)

    val fams: Seq[(String, DataFrame)] = Seq(
      "ledgers" -> StellarTransforms.historyLedgers(fx),
      "transactions" -> StellarTransforms.historyTransactions(fx),
      "operations" -> StellarTransforms.historyOperations(fx),
      "effects" -> StellarTradesEffects.historyEffects(fx),
      "trades" -> StellarTradesEffects.historyTrades(fx),
      "token_transfers" -> TokenTransfers.fromLedgers(fx),
      "assets" -> StellarTransforms.historyAssets(fx),
      "contract_events" -> StellarTransforms.contractEvents(fx.toDF()),
      "ledger_transactions" -> StellarTransforms.ledgerTransactions(fx.toDF()),
      "accounts" -> ChangeTransforms.accounts(changes),
      "signers" -> ChangeTransforms.accountSigners(changes),
      "offers" -> ChangeTransforms.offers(changes),
      "trustlines" -> ChangeTransforms.trustlines(changes),
      "claimable_balances" -> EntryProjections.claimableBalances(tbl("customer")),
      "changes/pools" -> EntryProjections.liquidityPools(tbl("part")),
      "changes/contract_data" -> EntryProjections.contractData(tbl("part")),
      "changes/contract_code" -> EntryProjections.contractCode(tbl("part")),
      "changes/config_setting" -> EntryProjections.configSettings(tbl("nation")),
      "changes/claimable_balances" -> EntryProjections.claimableBalances(tbl("customer")),
      "orderbooks/dim_accounts" -> OrderbookStar.dimAccount(OrderbookStar.liveOffers(ChangeTransforms.offers(changes))),
      "orderbooks/dim_offers" -> OrderbookStar.dimOffer(OrderbookStar.liveOffers(ChangeTransforms.offers(changes))),
      "orderbooks/dim_markets" -> OrderbookStar.dimMarket(OrderbookStar.liveOffers(ChangeTransforms.offers(changes))),
      "orderbooks/fact_offer_events" -> OrderbookStar.factOfferEvents(OrderbookStar.liveOffers(ChangeTransforms.offers(changes)))
    )

    val sb = new StringBuilder("{\n")
    fams.foreach { case (name, df) =>
      val cols = df.schema.fields.map(f =>
        s"""    "${f.name}": "${f.dataType.simpleString.take(60)}"""").mkString(",\n")
      sb.append(s"""  "$name": {\n$cols\n  },\n""")
    }
    sb.append("  \"_end\": {}\n}\n")
    println("SCHEMA_DUMP_BEGIN")
    println(sb.toString)
    println("SCHEMA_DUMP_END")
    spark.stop()
  }
}
