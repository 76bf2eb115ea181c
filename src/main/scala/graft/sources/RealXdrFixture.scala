package graft.sources

import graft.codec.{Hashes, ScVal, XdrEncode}

/** Deterministic post-protocol-20 REAL-XDR ledgers for the catalog's
  * round-trip gate: every value is affine in (seq, t) so the DuckDB oracle
  * re-derives the expected output while the engine decodes genuine wire
  * bytes — envelopes with SorobanTransactionData, results, v3 meta with
  * SorobanMeta fee ext + SAC events, fee meta — through the datastore
  * batch-file layout ([[LcmBatchFiles]]).
  *
  * Laws (all DuckDB-expressible):
  *   - ledgers `start..end`, closeTime = 1700000000 + 5·seq, protocol 21
  *   - per ledger, `seq % 3 + 1` soroban invoke txs, t = 0..seq%3
  *   - source key sha256("sacct-seq-t"), tx seqNum = 100·seq + t
  *   - max_fee = 100000 + seq + 10·t, fee_charged = 90000 + seq%977 + t
  *   - resource_fee = 40000 + seq%1000 + t, instructions = 1000000 + 3·seq + t
  *   - read/write bytes = 5000 + t / 2000 + t
  *   - fee-meta initial charge = 95000 + seq%500 + t
  *   - refund (TxChangesAfter) = 1200 + (seq+t)%100
  *   - SorobanMeta ext fees = (30000+t, 7000+seq%100, 900+t)
  *   - invoke: contract sha256("ct-seq-t"), fn "fn"+(t%3), args [U64(2·seq+t)]
  *   - footprint: RO [code key sha256("code-seq-t")], RW [data key (contract,
  *     Sym("k"), durability (seq+t)%2)]
  *   - one SAC transfer event: amount i128(0, 5000000 + seq + t), asset native
  *   - per tx, one state change per soroban state family (P13–P16 laws):
  *     ttl (created even / state+removed odd), contract_data (key Sym("k"),
  *     dur (seq+t)%2, val U64(7·seq+t); kind = t), contract_code (the
  *     footprint codeHash, ext v1 costs (i+1)·1000 + seq%89 + 3·t on odd
  *     (seq+t); kind = t), config_setting (arm by t: 0/3/11; created on
  *     even seq)
  */
object RealXdrFixture {

  private def key(s: String): Array[Byte] = Hashes.sha256(s.getBytes("UTF-8"))

  def tx(seq: Long, t: Long): XdrEncode.LcmTx = {
    val srcKey = key(s"sacct-$seq-$t")
    val contractId = key(s"ct-$seq-$t")
    val codeHash = key(s"code-$seq-$t")
    val resourceFee = 40000L + seq % 1000 + t
    val sd = XdrEncode.SorobanData(
      resourceFee = resourceFee,
      instructions = 1000000L + 3 * seq + t,
      readBytes = 5000L + t, writeBytes = 2000L + t,
      readOnlyKeys = Seq(XdrEncode.contractCodeLedgerKey(codeHash)),
      readWriteKeys = Seq(XdrEncode.contractDataLedgerKey(contractId,
        ScVal.encode(ScVal.Sym("k")), ((seq + t) % 2).toInt)))
    val env = XdrEncode.txEnvelopeV1(XdrEncode.TxSpec(
      sourceKey = srcKey,
      fee = 100000L + seq + 10 * t,
      seqNum = 100 * seq + t,
      ops = Seq(XdrEncode.invokeContractOp(contractId, s"fn${t % 3}",
        Seq(ScVal.encode(ScVal.U64(2 * seq + t))))),
      memoText = if (t % 2 == 0) Some(s"m-$seq-$t") else None,
      soroban = Some(sd),
      signatureSeed = ((seq + t) % 120).toByte))
    val result = XdrEncode.txResult(90000L + seq % 977 + t, 0,
      Seq(XdrEncode.invokeSuccess(key(s"rv-$seq-$t"))))
    val transfer = XdrEncode.contractEvent(Some(contractId), 1,
      Seq(ScVal.encode(ScVal.Sym("transfer")),
        ScVal.encode(ScVal.AddrAccount(srcKey)),
        ScVal.encode(ScVal.AddrContract(contractId)),
        ScVal.encode(ScVal.Str("native"))),
      ScVal.encode(ScVal.I128(0L, 5000000L + seq + t)))
    val refund = 1200L + (seq + t) % 100
    // one TTL state change per tx: created on even (seq+t), a
    // state+removed pair (deleted) on odd — the P16 real-path law
    val ttlKeyHash = key(s"ttlk-$seq-$t")
    val ttlEntry = XdrEncode.ledgerEntry(seq,
      XdrEncode.ttlEntry(ttlKeyHash, 200000L + seq + t))
    val ttlChanges =
      if ((seq + t) % 2 == 0) Seq(XdrEncode.change(0, ttlEntry))
      else Seq(XdrEncode.change(3, ttlEntry),
        XdrEncode.change(2, new XdrEncode.W().i32(9).raw(ttlKeyHash).bytes))
    // one contract_data change per tx (the P13 real-path law): key
    // Sym("k"), durability (seq+t)%2, val U64(7·seq+t); t picks the
    // change kind — 0 created, 1 state+updated (the state pre-image
    // carries a DIFFERENT val, proving the post image wins), 2
    // state+removed (deleted rides the pre-image, canonical val)
    val cdKey = ScVal.encode(ScVal.Sym("k"))
    val cdDur = ((seq + t) % 2).toInt
    def cdEntry(v: Long) = XdrEncode.ledgerEntry(seq,
      XdrEncode.contractDataEntry(contractId, cdKey, cdDur,
        ScVal.encode(ScVal.U64(v))))
    val cdChanges = t match {
      case 0 => Seq(XdrEncode.change(0, cdEntry(7 * seq + t)))
      case 1 => Seq(XdrEncode.change(3, cdEntry(7 * seq + t + 100)),
        XdrEncode.change(1, cdEntry(7 * seq + t)))
      case _ => Seq(XdrEncode.change(3, cdEntry(7 * seq + t)),
        XdrEncode.change(2,
          XdrEncode.contractDataLedgerKey(contractId, cdKey, cdDur)))
    }
    // one contract_code change per tx (the P14 real-path law): the
    // footprint's codeHash; ext v1 with cost inputs (i+1)·1000 +
    // seq%89 + 3·t on odd (seq+t), v0 (zero costs) on even
    val codeCosts =
      if ((seq + t) % 2 == 1)
        Some((0 until 10).map(i => (i + 1) * 1000L + seq % 89 + 3 * t))
      else None
    val codeEntry = XdrEncode.ledgerEntry(seq,
      XdrEncode.contractCodeEntry(codeHash,
        s"wasm-$seq-$t".getBytes("UTF-8"), codeCosts))
    val codeChanges = t match {
      case 0 => Seq(XdrEncode.change(0, codeEntry))
      case 1 => Seq(XdrEncode.change(1, codeEntry))
      case _ => Seq(XdrEncode.change(3, codeEntry),
        XdrEncode.change(2, XdrEncode.contractCodeLedgerKey(codeHash)))
    }
    // one config_setting change per tx (the P15 real-path law): t picks
    // the union arm — 0 → id 0 (contract max size 16384 + seq%1000),
    // 1 → id 3 (historical fee 4000 + seq%500), 2 → id 11 (ledger max
    // tx count 100 + seq%50); created on even seq, updated on odd
    val (cfgId, cfgV) = t match {
      case 0 => (0, 16384L + seq % 1000)
      case 1 => (3, 4000L + seq % 500)
      case _ => (11, 100L + seq % 50)
    }
    val cfgChanges = Seq(XdrEncode.change((seq % 2).toInt,
      XdrEncode.ledgerEntry(seq, XdrEncode.configSettingEntry(cfgId, cfgV))))
    val meta = XdrEncode.txMetaV3(XdrEncode.TxMetaV3Spec(
      opChanges = Seq(ttlChanges ++ cdChanges ++ codeChanges ++ cfgChanges),
      txChangesAfter = Seq(
        XdrEncode.change(3, XdrEncode.ledgerEntry(seq,
          XdrEncode.accountEntry(srcKey, 500L))),
        XdrEncode.change(1, XdrEncode.ledgerEntry(seq,
          XdrEncode.accountEntry(srcKey, 500L + refund)))),
      soroban = Some(XdrEncode.SorobanMetaSpec(
        nonRefundable = 30000L + t, refundable = 7000L + seq % 100,
        rent = 900L + t,
        diagnosticEvents = Seq(
          XdrEncode.diagnosticEvent(inSuccessful = true, transfer))))))
    val initialCharge = 95000L + seq % 500 + t
    val feeMeta = XdrEncode.feeMetaPair(srcKey,
      1000000000L, 1000000000L - initialCharge)
    XdrEncode.LcmTx(env, result, meta, feeMeta)
  }

  def ledger(seq: Long): (Array[Byte], Seq[XdrEncode.LcmTx]) = {
    val header = XdrEncode.ledgerHeader(XdrEncode.HeaderSpec(
      seq = seq, closeTime = 1700000000L + 5 * seq))
    (header, (0L to seq % 3).map(t => tx(seq, t)))
  }

  /** Write the batch-file tree once (idempotent per path). */
  def writeBatchTree(dir: String, start: Long, end: Long): Unit =
    LcmBatchFiles.writeTree(dir, (start to end).map(ledger))

  // ---- classic-era LP / claimable-balance corpus ----------------------------
  //
  // Exercises the wire arms the public golden corpus never reaches: full
  // LiquidityPoolEntry STATE/UPDATED pairs (reserves, shares, fee AND the
  // share-trustline count) behind deposit/withdraw ops, and
  // ClaimableBalanceEntry create/claim pairs with the ext-v1 clawback flag.
  //
  // Laws (all DuckDB-expressible; two txs per ledger):
  //   t=0 LP tx: source sha256("lpacct-seq"), pool sha256("pool-"+seq%4),
  //     assetA native, assetB USD:sha256("issuer-1");
  //     pre  reserves (10_000_000+100·seq, 20_000_000+200·seq),
  //          shares 5_000_000+50·seq, trustlines 3+seq%5, fee 30;
  //     even seq → deposit  delta (+100_000+seq, +200_000+seq, +10_000+seq)
  //     odd  seq → withdraw delta (−50_000−seq, −70_000−seq, −5_000−seq)
  //   t=1 CB tx: source sha256("cbacct-seq"); balance id sha256("cb-sEven")
  //     where sEven = seq − seq%2; amount 3_000_000+sEven; asset native;
  //     clawback flag set iff sEven%4 == 0; claimant sha256("claimant-sEven");
  //     even seq → create (result carries the balance id, entry CREATED)
  //     odd  seq → claim  (STATE pre-image ‖ REMOVED key — details amount/
  //                        asset/flag come from the pre-image)
  //   fees: max 200+seq+t, charged 100+seq%97+t, seqNum 10·seq+t

  private val usd = graft.model.LedgerModel.AssetRef("credit_alphanum4",
    "USD", graft.codec.Strkey.encodeAccountId(key("issuer-1")))
  private val native = graft.model.LedgerModel.AssetRef("native", "", "")

  def classicTx(seq: Long, t: Long): XdrEncode.LcmTx = {
    val (srcKey, opBody, opResult, opChanges) =
      if (t == 0L) {
        val src = key(s"lpacct-$seq")
        val poolId = key(s"pool-${seq % 4}")
        val preA = 10000000L + 100 * seq
        val preB = 20000000L + 200 * seq
        val preS = 5000000L + 50 * seq
        val tl = 3 + seq % 5
        def lp(rA: Long, rB: Long, sh: Long) = XdrEncode.ledgerEntry(seq,
          XdrEncode.liquidityPoolEntry(poolId, native, usd, 30,
            rA, rB, sh, tl))
        if (seq % 2 == 0) {
          val (dA, dB, dS) = (100000L + seq, 200000L + seq, 10000L + seq)
          (src,
            XdrEncode.lpDepositOp(poolId, dA, dB, 1, 2, 3, 4),
            XdrEncode.OpResultSpec(22, 0),
            Seq(XdrEncode.change(3, lp(preA, preB, preS)),
              XdrEncode.change(1, lp(preA + dA, preB + dB, preS + dS))))
        } else {
          val (wA, wB, wS) = (50000L + seq, 70000L + seq, 5000L + seq)
          (src,
            XdrEncode.lpWithdrawOp(poolId, wS, 1L, 2L),
            XdrEncode.OpResultSpec(23, 0),
            Seq(XdrEncode.change(3, lp(preA, preB, preS)),
              XdrEncode.change(1, lp(preA - wA, preB - wB, preS - wS))))
        }
      } else {
        val src = key(s"cbacct-$seq")
        val sEven = seq - seq % 2
        val balanceId = key(s"cb-$sEven")
        val amount = 3000000L + sEven
        val clawback = sEven % 4 == 0
        val claimant = key(s"claimant-$sEven")
        val entry = XdrEncode.ledgerEntry(seq,
          XdrEncode.claimableBalanceEntry(balanceId, Seq(claimant),
            native, amount, clawback))
        if (seq % 2 == 0)
          (src,
            XdrEncode.createClaimableBalanceOp(native, amount, Seq(claimant)),
            XdrEncode.createCbSuccess(balanceId),
            Seq(XdrEncode.change(0, entry)))
        else
          (src,
            XdrEncode.claimClaimableBalanceOp(balanceId),
            XdrEncode.OpResultSpec(15, 0),
            Seq(XdrEncode.change(3, entry),
              XdrEncode.change(2,
                XdrEncode.claimableBalanceLedgerKey(balanceId))))
      }
    val env = XdrEncode.txEnvelopeV1(XdrEncode.TxSpec(
      sourceKey = srcKey,
      fee = 200L + seq + t,
      seqNum = 10 * seq + t,
      ops = Seq(opBody),
      signatureSeed = ((seq + t) % 120).toByte))
    val charged = 100L + seq % 97 + t
    val result = XdrEncode.txResult(charged, 0, Seq(opResult))
    val meta = XdrEncode.txMetaV3(XdrEncode.TxMetaV3Spec(
      opChanges = Seq(opChanges)))
    val feeMeta = XdrEncode.feeMetaPair(srcKey,
      1000000000L, 1000000000L - charged)
    XdrEncode.LcmTx(env, result, meta, feeMeta)
  }

  def classicLedger(seq: Long): (Array[Byte], Seq[XdrEncode.LcmTx]) = {
    val header = XdrEncode.ledgerHeader(XdrEncode.HeaderSpec(
      seq = seq, closeTime = 1700000000L + 5 * seq))
    (header, Seq(classicTx(seq, 0L), classicTx(seq, 1L)))
  }

  /** Write the classic LP/CB batch-file tree once (idempotent per path). */
  def writeClassicBatchTree(dir: String, start: Long, end: Long): Unit =
    LcmBatchFiles.writeTree(dir, (start to end).map(classicLedger))
}
