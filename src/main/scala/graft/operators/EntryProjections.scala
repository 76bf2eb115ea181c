package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** P7–P16 — the nine `export_ledger_entry_changes` output projections:
  * per-entry-type flat tables derived from change-grain rows (reference
  * `transform/{account,account_signer,offer,trustline,liquidity_pool,
  * claimable_balance,contract_data,contract_code,config_setting,ttl}.go`).
  *
  * All are O(1)-per-row column projections — they compose with the change
  * compaction (A4) and stay entirely inside whole-stage codegen. The fixture
  * input contracts are documented per function; the real XDR-decoded inputs
  * share the same shapes. */
object EntryProjections {

  /** P8 — account signers: signer rows ranked by weight desc within account
    * (reference sorts signers by weight, `account_signer.go:53`). */
  def signersRanked(signers: DataFrame, accountCol: String, signerCol: String,
      weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(accountCol)
      .orderBy(col(weightCol).desc, col(signerCol).asc)
    signers.withColumn("signer_rank", row_number().over(w).cast("long"))
  }

  /** P10 — trust lines: balances, liabilities, and the base64 ledger key
    * (`trustline.go:93-107`). */
  def trustlines(txGrain: DataFrame): DataFrame =
    txGrain.select(
      col("source_account_key").as("account_id"),
      concat(lit("AST"), expr("part_key % 5").cast("string")).as("asset"),
      col("amount").as("balance"),
      (col("amount") / 2).as("buying_liabilities"),
      (col("amount") / 4).as("selling_liabilities"),
      GraftFunctions.base64NoWrap(concat(lit("TL|"),
        col("source_account_key").cast("string"),
        lit("|AST"), expr("part_key % 5").cast("string")).cast("binary"))
        .as("ledger_key_b64"),
      col("successful").as("authorized"))

  /** P11 — liquidity pools at the reference's full `PoolOutput` width
    * (`schema.go:198-220`, `liquidity_pool.go:13-90`): constant-product
    * params, per-asset type/code/issuer/amount/farmhash-id, trustline and
    * share counts, change metadata, strkey L-address. */
  def liquidityPools(parts: DataFrame): DataFrame = {
    val k = col("p_partkey").cast("long")
    val poolIdHex = sha2(col("p_name"), 256)
    val bCode = concat(lit("TK"), (k % 50).cast("string"))
    val bIssuer = concat(lit("ISS"), (k % 3).cast("string"))
    parts.select(
      poolIdHex.as("liquidity_pool_id"),
      lit("constant_product").as("type"),
      lit(30L).as("fee"),
      (k % 50 + 1).as("trustline_count"),
      GraftFunctions.stroopsToXlm(k * 10000001).as("pool_share_count"),
      lit("native").as("asset_a_type"),
      lit(null).cast("string").as("asset_a_code"),
      lit(null).cast("string").as("asset_a_issuer"),
      GraftFunctions.stroopsToXlm(lit(5000000000L) + k).as("asset_a_amount"),
      GraftFunctions.farmHashAssetId(lit(""), lit(""), lit("native"))
        .as("asset_a_id"),
      lit("credit_alphanum4").as("asset_b_type"),
      bCode.as("asset_b_code"),
      bIssuer.as("asset_b_issuer"),
      GraftFunctions.stroopsToXlm(lit(2500000000L) + k).as("asset_b_amount"),
      GraftFunctions.farmHashAssetId(bCode, bIssuer, lit("credit_alphanum4"))
        .as("asset_b_id"),
      k.as("last_modified_ledger"),
      (k % 3).as("ledger_entry_change"),
      (k % 7 === 6).as("deleted"),
      (k + 100).as("ledger_sequence"),
      GraftFunctions.strkeyPool(unhex(poolIdHex))
        .as("liquidity_pool_id_strkey"))
  }

  /** P12/L3 — claimable balances at claimant grain (array-of-claimants
    * exploded; predicate serialized as JSON; claimants ordered by
    * destination, `effects.go:1138-1140`), with the change-metadata columns
    * every `ClaimableBalanceOutput` carries (`schema.go:158-162`). */
  def claimableBalances(custGrain: DataFrame): DataFrame = {
    val k = col("c_custkey").cast("long")
    custGrain.select(
      sha2(col("c_custkey").cast("string"), 256).as("balance_id"),
      concat(lit("ACC"), col("c_custkey").cast("string")).as("claimant_destination"),
      // real recursive predicate tree: encoded to XDR by the fixture builder,
      // decoded + rendered by the codec (`claimable_balance.go:11-21`,
      // `schema.go:166-170`) — and re-derived independently by the oracle
      GraftFunctions.claimPredicateJson(
        GraftFunctions.claimPredicateFixture(col("c_custkey").cast("long")))
        .as("claimant_predicate"),
      col("c_acctbal").as("amount"),
      col("c_nationkey").cast("long").as("sponsoring_nation"),
      k.as("last_modified_ledger"),
      (k % 3).as("ledger_entry_change"),
      (k % 7 === 6).as("deleted"),
      (k + 100).as("ledger_sequence"))
  }

  /** P13 — contract data incl. SAC detection flag and i128 balance string
    * (`contract_data.go:49-158,306-379`). */
  def contractData(parts: DataFrame): DataFrame = {
    // the entry value as a real ScVal: XDR-encoded map {balance:i128, key:str}
    // serialized base64 + decoded JSON, the reference's two-column contract
    // (`contract_events.go:128-148` serializeScVal; `contract_data.go:306-379`)
    val scval = GraftFunctions.scvalContractValBytes(
      col("p_partkey"), col("p_size").cast("long"), col("p_type"))
    val k = col("p_partkey").cast("long")
    parts.select(
      sha2(concat(lit("contract|"), col("p_name")), 256).as("contract_id_hex"),
      (col("p_size") < 10).as("is_sac"),
      GraftFunctions.int128String(col("p_partkey"), col("p_size").cast("long"))
        .as("balance_i128"),
      col("p_type").as("storage_key"),
      GraftFunctions.base64NoWrap(scval).as("val_b64"),
      GraftFunctions.scvalJson(scval).as("val_decoded"),
      // change metadata, `ContractDataOutput` parity (`schema.go:520-524`)
      k.as("last_modified_ledger"),
      (k % 3).as("ledger_entry_change"),
      (k % 7 === 6).as("deleted"),
      (k + 100).as("ledger_sequence"))
  }

  /** P14 — contract code at the reference's `ContractCodeOutput` width
    * (`schema.go:534-556`, `contract_code.go:12-101`): hash, ext version,
    * the ten wasm cost stats, change metadata, ledger key hash hex+base64. */
  def contractCode(parts: DataFrame): DataFrame = {
    val k = col("p_partkey").cast("long")
    val s = col("p_size").cast("long")
    val keyHashHex = sha2(concat(lit("ck|"), col("p_name")), 256)
    parts.select(
      sha2(concat(lit("wasm|"), col("p_name")), 256).as("contract_code_hash"),
      (k % 2).as("contract_code_ext_v"),
      k.as("last_modified_ledger"),
      (k % 3).as("ledger_entry_change"),
      (k % 7 === 6).as("deleted"),
      (k + 100).as("ledger_sequence"),
      keyHashHex.as("ledger_key_hash"),
      (s * 100).as("n_instructions"),
      pmod(s, lit(20)).as("n_functions"),
      (s % 9).as("n_globals"),
      (s % 5).as("n_table_entries"),
      (s % 11 + 1).as("n_types"),
      (s % 4).as("n_data_segments"),
      (s % 3).as("n_elem_segments"),
      (s % 13).as("n_imports"),
      (s % 17 + 1).as("n_exports"),
      (s * 7).as("n_data_segment_bytes"),
      GraftFunctions.base64NoWrap(unhex(keyHashHex))
        .as("ledger_key_hash_base_64"))
  }

  /** P15 — config settings: the full ~45-scalar projection across the 13
    * config union arms (`config_setting.go:13-163`): contract size, compute,
    * ledger cost, historical data, events, bandwidth, cost params (as
    * `array<map<string,string>>`, `serializeParams` at :152-163), data
    * key/entry sizes, state archival, execution lanes, bucket-list window.
    * Values derive deterministically from the nation fixture columns. */
  def configSettings(nations: DataFrame): DataFrame = {
    val k = col("n_nationkey").cast("long")
    val r = col("n_regionkey").cast("long")
    def costParam(const: Column, linear: Column): Column =
      map(lit("ExtV"), lit("0"),
        lit("ConstTerm"), const.cast("string"),
        lit("LinearTerm"), linear.cast("string"))
    nations.select(
      k.as("config_setting_id"),
      (r * 1000).as("contract_max_size_bytes"),
      (k * 1000000 + 1000).as("ledger_max_instructions"),
      (r * 100 + 50).as("tx_max_instructions"),
      (k * 25).as("fee_rate_per_instructions_increment"),
      (r * 512 + 64).as("tx_memory_limit"),
      (k % 10 + 1).as("ledger_max_read_ledger_entries"),
      (k * 2048).as("ledger_max_read_bytes"),
      (k % 5 + 1).as("ledger_max_write_ledger_entries"),
      (k * 1024).as("ledger_max_write_bytes"),
      (k % 8 + 1).as("tx_max_read_ledger_entries"),
      (k * 512).as("tx_max_read_bytes"),
      (k % 4 + 1).as("tx_max_write_ledger_entries"),
      (k * 256).as("tx_max_write_bytes"),
      (k * 3 + 1).as("fee_read_ledger_entry"),
      (k * 5 + 2).as("fee_write_ledger_entry"),
      (k * 7 + 3).as("fee_read_1kb"),
      (k * 1000000).as("bucket_list_target_size_bytes"),
      (r * 11).as("write_fee_1kb_bucket_list_low"),
      (r * 211).as("write_fee_1kb_bucket_list_high"),
      (k % 3 + 1).as("bucket_list_write_fee_growth_factor"),
      (k * 13).as("fee_historical_1kb"),
      (r * 4096).as("tx_max_contract_events_size_bytes"),
      (k * 17).as("fee_contract_events_1kb"),
      (k * 8192).as("ledger_max_txs_size_bytes"),
      (r * 2048 + 512).as("tx_max_size_bytes"),
      (k * 19).as("fee_tx_size_1kb"),
      array(costParam(k * 10, r), costParam(k * 20, r + 1))
        .as("contract_cost_params_cpu_insns"),
      array(costParam(k * 30, r + 2)).as("contract_cost_params_mem_bytes"),
      (r * 64 + 16).as("contract_data_key_size_bytes"),
      (r * 128 + 32).as("contract_data_entry_size_bytes"),
      (k * 100000 + 10000).as("max_entry_ttl"),
      lit(16L).as("min_temporary_ttl"),
      lit(4096L).as("min_persistent_ttl"),
      (k * 1000 + 1).as("persistent_rent_rate_denominator"),
      (k * 100 + 1).as("temp_rent_rate_denominator"),
      (k % 7 + 1).as("max_entries_to_archive"),
      lit(30L).as("bucket_list_size_window_sample_size"),
      (k * 50000).as("eviction_scan_size"),
      (k % 6 + 1).as("starting_eviction_scan_level"),
      (r * 100 + 10).as("ledger_max_tx_count"),
      array(k * 1000, k * 1000 + 1, k * 1000 + 2)
        .as("bucket_list_size_window"),
      k.as("last_modified_ledger"),
      (k % 3).as("ledger_entry_change"),
      (k % 7 === 6).as("deleted"),
      col("n_name").as("setting_name"))
  }

  /** P16 — TTLs: key hash hex + live-until sequence (`ttl.go:12-49`). */
  def ttls(eventGrain: DataFrame): DataFrame =
    eventGrain.select(
      sha2(col("event_id").cast("string"), 256).as("key_hash"),
      col("event_id").as("last_modified_ledger"),
      (col("event_id") + 64).as("live_until_ledger_seq"))

  /** P17 — contract events: topics array + decoded-JSON payload
    * (`contract_events.go:20-104,128-169`). */
  def contractEvents(eventGrain: DataFrame): DataFrame = {
    // event payload as a real ScVal map {amount:i128, event:sym, user:u64}:
    // `data` = base64(XDR), `data_decoded` = recursive JSON — the exact
    // column pair `serializeScVal` emits (`contract_events.go:128-169`)
    val scval = GraftFunctions.scvalEventBytes(col("event_type"),
      col("user_id"), round(col("value") * 100).cast("long"))
    eventGrain.select(
      col("event_id").as("contract_event_id"),
      array(col("event_type"), col("user_id").cast("string")).as("topics"),
      GraftFunctions.base64NoWrap(scval).as("data"),
      GraftFunctions.scvalJson(scval).as("data_decoded"),
      (col("event_type") === "error").as("in_failed_contract_call"))
  }

  /** P18 — raw XDR passthrough table: base64 envelope columns
    * (`ledger_transaction.go:13-58`). */
  def rawBase64(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      GraftFunctions.base64NoWrap(col("text").cast("binary")).as("envelope_b64"),
      length(col("text")).cast("long").as("envelope_len"))

  /** J3 — sponsor lookup: first sponsoring op (op_type 6) in the same ledger,
    * found intra-row in the nested tx array — no join, no shuffle
    * (`operation.go:296-326`). */
  def withSponsor(nestedLedgers: DataFrame): DataFrame =
    nestedLedgers
      .select(col("ledger_sequence"),
        // get() is null-safe on the empty array (ANSI element_at would throw)
        get(filter(col("transactions"), t => t("op_type") === 6), lit(0))("supp_key")
          .as("sponsor"),
        posexplode(col("transactions")).as(Seq("pos", "tx")))
      .select(
        col("ledger_sequence"),
        (col("pos") + 1).cast("long").as("tx_order"),
        col("tx.supp_key").as("source_account_key"),
        col("sponsor"))
}
