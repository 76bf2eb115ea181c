package graft.codec

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** XDR codec for the ledger-close-meta SUBSET the decoded model carries —
  * the source-boundary analog of the reference's XDR unmarshal layer
  * (`/root/reference/internal/utils/main.go:686-705` unmarshals full
  * `xdr.LedgerCloseMeta` from the datastore batch objects). The environment
  * ships no real LCM corpus, so the fixture encodes and the DSv2 source
  * decodes this self-described subset using the same RFC 4506 wire rules as
  * the real thing (4-byte big-endian discriminants/lengths, 8-byte hypers,
  * bool as int, XDR strings length-prefixed and zero-padded to 4, fixed
  * opaque unprefixed, optionals as bool ‖ value), shaped like the public
  * `Stellar-ledger.x`/`Stellar-transaction.x` unions:
  *
  * {{{
  * LcmFrame — union on the leading int, like the real `LedgerCloseMeta`:
  *   int v               // 0 = classic arm, 1 = soroban-era arm, 2 = legacy
  *
  * v0 / v1 (header-carrying arms, `Stellar-ledger.x` LedgerCloseMetaV0/V1):
  *   uint32 ledgerSeq    // header.ledgerSeq
  *   uint64 closeTimeMs  // header.scpValue.closeTime, milliseconds here
  *   // LedgerHeader subset:
  *   uint32 protocolVersion   // header.ledgerVersion
  *   opaque prevHash[32]      // header.previousLedgerHash
  *   hyper  totalCoins
  *   hyper  feePool
  *   uint32 baseFee
  *   uint32 baseReserve
  *   uint32 maxTxSetSize
  *   uint32 nUpgrades         // upgradesProcessing<>
  *   nUpgrades × {            // LedgerUpgrade union:
  *     int tag                // 1 VERSION | 2 BASE_FEE | 3 MAX_TX_SET_SIZE
  *     uint32 value           // | 4 BASE_RESERVE | 5 FLAGS
  *   }
  *   [v == 1]:                // the protocol-20+ additions of V1
  *     uint64 bucketListSizeBytes   // totalByteSizeOfBucketList
  *     bool ‖ hyper sorobanFeeWrite1000   // optional ext
  *   uint32 nTx ‖ tx bodies   // txProcessing<>, layout below
  *
  * v2 (legacy header-less arm kept for wire compat):
  *   uint32 ledgerSeq
  *   uint64 closeTimeMs
  *   uint32 nTx ‖ tx bodies
  *
  * tx body (shared by every arm):
  *     int envType       // ENVELOPE_TYPE_TX = 2 | ENVELOPE_TYPE_TX_FEE_BUMP = 5
  *     [envType == 5]:   // the fee-bump shell wrapping the inner tx
  *       opaque feeSource[32]
  *       hyper  feeBumpFee
  *     sourceAccount:    // MuxedAccount union: ED25519(0) |
  *       int muxTag      //   MUXED_ED25519(1: hyper subAccountId first)
  *       [muxTag == 1]: hyper muxedId
  *       opaque sourceKey[32]
  *     memo union:       // MEMO_NONE(0) | TEXT(1: string<28>) | ID(2: u64)
  *       int tag         // | HASH(3: opaque[32]) | RETURN(4: opaque[32])
  *     cond union:       // PRECOND_NONE(0) | TIME(1: u64 min,max)
  *       int tag         // | V2(2): TimeBounds* ‖ LedgerBounds* ‖ minSeqNum*
  *                       //   ‖ hyper minSeqAge ‖ uint32 minSeqLedgerGap
  *                       //   ‖ uint32 n ‖ n × SignerKey  (extraSigners<2>;
  *                       //   SignerKey = int type ‖ opaque key[32]
  *                       //   [type 3: ‖ opaque payload<64>])
  *     int    resultCode // the FULL signed TransactionResultCode enum,
  *                       // 1 txFEE_BUMP_INNER_SUCCESS .. -17 txSOROBAN_INVALID;
  *                       // out-of-enum values are rejected on decode
  *     hyper  feeCharged
  *     bool ‖ 3 × hyper  // optional SorobanTransactionMetaExt v1 fee triple:
  *                       // nonRefundable ‖ refundable ‖ rent fee charged
  *     uint32 nOps       // envelope operations<>
  *     nOps × {          // Operation: optional per-op sourceAccount +
  *       bool hasSource  //   the body union on the op type, like the
  *       [opaque source[32]]           //   real `Operation` layout
  *       int opType
  *       hyper amountStroops
  *       [opType == 0]:  // CREATE_ACCOUNT: destination ‖ (amount above
  *         opaque destination[32]              //  is startingBalance)
  *       [opType == 1]:  // PAYMENT: destination ‖ asset code
  *         opaque destination[32] ‖ string assetCode<12>
  *       [opType == 2]:  // PATH_PAYMENT_STRICT_RECEIVE (amount above is
  *         opaque destination[32]              //  destAmount)
  *         ‖ string sendAssetCode<12> ‖ string destAssetCode<12>
  *         ‖ hyper sendMax ‖ hyper resultSendAmount  // result-carried
  *       [opType == 3]:  // MANAGE_SELL_OFFER (amount above is amount)
  *         hyper offerId ‖ string selling<12> ‖ string buying<12>
  *         ‖ int priceN ‖ int priceD
  *         ‖ bool hasResultOfferId ‖ [hyper resultOfferId]  // result-carried
  *       [opType == 12]: // MANAGE_BUY_OFFER (amount above is buyAmount)
  *         same layout as 3
  *       [opType == 13]: // PATH_PAYMENT_STRICT_SEND (amount above is
  *         opaque destination[32]              //  sendAmount)
  *         ‖ string sendAssetCode<12> ‖ string destAssetCode<12>
  *         ‖ hyper destMin ‖ hyper resultDestAmount  // result-carried
  *       [opType == 4]:  // CREATE_PASSIVE_SELL_OFFER: offer layout, no id
  *         string selling<12> ‖ string buying<12> ‖ int priceN ‖ int priceD
  *         ‖ bool hasResultOfferId ‖ [hyper resultOfferId]
  *       [opType == 6]:  // CHANGE_TRUST
  *         string assetCode<12> ‖ hyper limit
  *       [opType == 8]:  // ACCOUNT_MERGE
  *         opaque destination[32]
  *       [opType == 10]: // MANAGE_DATA: optional value deletes when absent
  *         string name<64> ‖ bool hasValue ‖ [opaque value<64>]
  *       [opType == 11]: // BUMP_SEQUENCE
  *         hyper bumpTo
  *       [opType == 5]:  // SET_OPTIONS: nine XDR optionals in order
  *         bool‖[opaque inflationDest[32]] ‖ bool‖[int clearFlags]
  *         ‖ bool‖[int setFlags] ‖ bool‖[int masterWeight]
  *         ‖ bool‖[int lowThreshold] ‖ bool‖[int medThreshold]
  *         ‖ bool‖[int highThreshold] ‖ bool‖[string homeDomain<32>]
  *         ‖ bool‖[opaque signerKey[32] ‖ int signerWeight]
  *       [opType == 7]:  // ALLOW_TRUST
  *         opaque trustor[32] ‖ string assetCode<12> ‖ int authorize
  *       [opType == 19]: // CLAWBACK (amount above is the clawback amount)
  *         string assetCode<12> ‖ opaque from[32]
  *       [opType == 14]: // CREATE_CLAIMABLE_BALANCE (amount above is the
  *         string assetCode<12>              // balance amount)
  *         ‖ uint32 n ‖ n × opaque claimant[32]  // claimants<10>, the
  *                                           // model's unconditional subset
  *       [opType == 15 | 20]: // CLAIM / CLAWBACK_CLAIMABLE_BALANCE
  *         opaque balanceId[32]              // ClaimableBalanceID v0 hash
  *       [opType == 16]: // BEGIN_SPONSORING_FUTURE_RESERVES
  *         opaque sponsoredId[32]
  *       [opType == 18]: // REVOKE_SPONSORSHIP: union on the revoke tag
  *         int revokeType   // 0 LEDGER_ENTRY | 1 SIGNER
  *         [0]: int ledgerEntryType ‖ opaque key[32]
  *         [1]: opaque account[32] ‖ opaque signerKey[32]
  *       [opType == 21]: // SET_TRUST_LINE_FLAGS
  *         opaque trustor[32] ‖ string assetCode<12>
  *         ‖ uint32 clearFlags ‖ uint32 setFlags
  *       [opType == 22]: // LIQUIDITY_POOL_DEPOSIT
  *         opaque poolId[32] ‖ hyper maxAmountA ‖ hyper maxAmountB
  *         ‖ int minPriceN ‖ int minPriceD ‖ int maxPriceN ‖ int maxPriceD
  *       [opType == 23]: // LIQUIDITY_POOL_WITHDRAW (amount above is the
  *         opaque poolId[32]                 // burned pool shares)
  *         ‖ hyper minAmountA ‖ hyper minAmountB
  *       [opType == 24]: // INVOKE_HOST_FUNCTION: HostFunction type +
  *         int hostFnType   // 0 INVOKE_CONTRACT | 1 CREATE_CONTRACT
  *                          // | 2 UPLOAD_WASM | 3 CREATE_CONTRACT_V2
  *         bool ‖ opaque contractId[32]  // absent for UPLOAD_WASM
  *       [opType == 25]: // EXTEND_FOOTPRINT_TTL
  *         uint32 extendTo
  *       [opType == 9 | 17 | 26]: // INFLATION / END_SPONSORING /
  *         // RESTORE_FOOTPRINT: VOID bodies — the stand-in arm is
  *         // wire-exact for these; all 27 operation types round-trip
  *     uint32 nChanges             // per-op LedgerEntryChanges subset
  *     nChanges × {                // (TransactionMeta grain)
  *       int kind                  // CREATED(0)/UPDATED(1)/REMOVED(2)
  *       int entryType             // the 10-arm LedgerEntryType enum
  *       int opIndex               // owning operation
  *       opaque keyHash[32]        // ledger-key fingerprint
  *       uint32 lastModified ‖ hyper balance
  *       [entryType == 2]:         // OFFER pre-state (trade pricing)
  *         hyper offerId ‖ int prePriceN ‖ int prePriceD  // 0/0 = no pre
  *       [entryType == 5]:         // LIQUIDITY_POOL constant-product
  *         hyper preReserveA ‖ preReserveB ‖ preShares
  *         ‖ hyper postReserveA ‖ postReserveB ‖ postShares
  *         ‖ int poolFeeBps        // pre-state fee
  *         ‖ bool hasPoolId ‖ [opaque poolId[32]]  // LP-change match key
  *       bool hasSponsor ‖ [opaque sponsor[32]]  // Post.SponsoringID
  *     }
  *     uint32 nClaimAtoms          // per-op RESULT ClaimAtoms
  *     nClaimAtoms × {             // (history_trades grain)
  *       int opIndex ‖ int atomType    // 0 orderbook | 1 liquidity pool
  *       opaque sellerOrPoolId[32] ‖ hyper offerId   // 0 for LP
  *       string soldCode<12> ‖ hyper soldAmount
  *       string boughtCode<12> ‖ hyper boughtAmount
  *     }
  *     uint32 nContractEvents      // SorobanTransactionMeta.events subset
  *     nContractEvents × {         // (contract_events grain)
  *       int opIndex ‖ int eventType   // SYSTEM(0)/CONTRACT(1)/DIAGNOSTIC(2)
  *       opaque contractId[32]
  *       uint32 nTopics ‖ nTopics × opaque<> topicScValXdr
  *       opaque<> dataScValXdr
  *     }
  * }}}
  *
  * Batch files (`{start}-{end}.lcmb`) are a stream of `uint32 len ‖ frame`
  * records — the length prefix lets a reader skip out-of-range frames
  * without decoding them, mirroring the datastore's per-object framing. */
object Lcm {

  /** `Operation.body` union — all 27 operation types: 24 carry typed
    * detail arms; INFLATION(9), END_SPONSORING_FUTURE_RESERVES(17) and
    * RESTORE_FOOTPRINT(26) have void bodies, for which the flat stand-in
    * arm is wire-exact.
    *
    * The path-payment arms carry the RESULT-side actual amount next to the
    * envelope-side bound, because the reference's operation details take
    * the traded amounts from `PathPaymentStrictReceiveResult` /
    * `...StrictSendResult`, not the envelope
    * (`internal/transform/operation.go:641-697`): strict-receive fixes
    * destAmount and the result carries what the source actually paid;
    * strict-send fixes sendAmount and the result carries what the
    * destination actually received. */
  sealed trait OpDetail
  case object OpGeneric extends OpDetail
  case class OpCreateAccount(destination: Seq[Byte]) extends OpDetail {
    require(destination.size == 32, "destination is opaque[32]")
  }
  case class OpPayment(destination: Seq[Byte], assetCode: String) extends OpDetail {
    require(destination.size == 32, "destination is opaque[32]")
    require(assetCode.getBytes(StandardCharsets.UTF_8).length <= 12,
      "asset code is string<12>")
  }
  /** opType 2 — amountStroops is destAmount (fixed receive);
    * `resultSendAmount` is the result-carried actual source spend,
    * bounded by `sendMax`. */
  case class OpPathPaymentStrictReceive(destination: Seq[Byte],
      sendAssetCode: String, destAssetCode: String,
      sendMax: Long, resultSendAmount: Long) extends OpDetail {
    require(destination.size == 32, "destination is opaque[32]")
    require(sendAssetCode.getBytes(StandardCharsets.UTF_8).length <= 12 &&
      destAssetCode.getBytes(StandardCharsets.UTF_8).length <= 12,
      "asset code is string<12>")
  }
  /** opType 13 — amountStroops is sendAmount (fixed send); `resultDestAmount`
    * is the result-carried actual delivered amount, ≥ `destMin`. */
  case class OpPathPaymentStrictSend(destination: Seq[Byte],
      sendAssetCode: String, destAssetCode: String,
      destMin: Long, resultDestAmount: Long) extends OpDetail {
    require(destination.size == 32, "destination is opaque[32]")
    require(sendAssetCode.getBytes(StandardCharsets.UTF_8).length <= 12 &&
      destAssetCode.getBytes(StandardCharsets.UTF_8).length <= 12,
      "asset code is string<12>")
  }
  /** opType 3 (sell: amountStroops is the selling amount) and opType 12
    * (buy: amountStroops is buyAmount) share the offer layout; price is
    * the XDR rational (n, d). offerId 0 creates, nonzero updates/deletes. */
  case class OpManageSellOffer(offerId: Long, sellingCode: String,
      buyingCode: String, priceN: Int, priceD: Int,
      resultOfferId: Option[Long] = None) extends OpDetail {
    require(sellingCode.getBytes(StandardCharsets.UTF_8).length <= 12 &&
      buyingCode.getBytes(StandardCharsets.UTF_8).length <= 12,
      "asset code is string<12>")
    require(priceD != 0, "price denominator must be nonzero")
    require(resultOfferId.forall(_ > 0), "result offer id is positive")
  }
  case class OpManageBuyOffer(offerId: Long, sellingCode: String,
      buyingCode: String, priceN: Int, priceD: Int,
      resultOfferId: Option[Long] = None) extends OpDetail {
    require(sellingCode.getBytes(StandardCharsets.UTF_8).length <= 12 &&
      buyingCode.getBytes(StandardCharsets.UTF_8).length <= 12,
      "asset code is string<12>")
    require(priceD != 0, "price denominator must be nonzero")
    require(resultOfferId.forall(_ > 0), "result offer id is positive")
  }
  /** opType 4 — the sell-offer layout WITHOUT an offer id (passive offers
    * only ever create; they never cross an existing offer at equal price,
    * `Stellar-transaction.x CreatePassiveSellOfferOp`). */
  case class OpCreatePassiveSellOffer(sellingCode: String, buyingCode: String,
      priceN: Int, priceD: Int,
      resultOfferId: Option[Long] = None) extends OpDetail {
    require(sellingCode.getBytes(StandardCharsets.UTF_8).length <= 12 &&
      buyingCode.getBytes(StandardCharsets.UTF_8).length <= 12,
      "asset code is string<12>")
    require(priceD != 0, "price denominator must be nonzero")
    require(resultOfferId.forall(_ > 0), "result offer id is positive")
  }
  /** opType 6 — CHANGE_TRUST: asset + trust limit (limit 0 deletes the
    * trustline, `operation.go` change_trust details). */
  case class OpChangeTrust(assetCode: String, limit: Long) extends OpDetail {
    require(assetCode.getBytes(StandardCharsets.UTF_8).length <= 12,
      "asset code is string<12>")
  }
  /** opType 8 — ACCOUNT_MERGE: the op body IS the destination account
    * (`Stellar-transaction.x` merges carry no other field; the stand-in
    * amount keeps the flat law). */
  case class OpAccountMerge(destination: Seq[Byte]) extends OpDetail {
    require(destination.size == 32, "destination is opaque[32]")
  }
  /** opType 10 — MANAGE_DATA: name string<64> + optional value opaque<64>
    * (an absent value deletes the data entry). */
  case class OpManageData(name: String, value: Option[Seq[Byte]])
      extends OpDetail {
    require(name.getBytes(StandardCharsets.UTF_8).length <= 64,
      "data name is string<64>")
    require(value.forall(_.size <= 64), "data value is opaque<64>")
  }
  /** opType 11 — BUMP_SEQUENCE: the target sequence number (SequenceNumber
    * = int64). */
  case class OpBumpSequence(bumpTo: Long) extends OpDetail
  /** opType 5 — SET_OPTIONS: nine independent optionals, encoded as the
    * XDR optional pattern (bool ‖ value) in declaration order
    * (`Stellar-transaction.x SetOptionsOp`); the signer collapses to
    * (key opaque[32], weight) in the model subset. */
  case class OpSetOptions(
      inflationDest: Option[Seq[Byte]] = None,
      clearFlags: Option[Int] = None,
      setFlags: Option[Int] = None,
      masterWeight: Option[Int] = None,
      lowThreshold: Option[Int] = None,
      medThreshold: Option[Int] = None,
      highThreshold: Option[Int] = None,
      homeDomain: Option[String] = None,
      signer: Option[(Seq[Byte], Int)] = None) extends OpDetail {
    require(inflationDest.forall(_.size == 32), "inflation dest is opaque[32]")
    require(homeDomain.forall(_.getBytes(StandardCharsets.UTF_8).length <= 32),
      "home domain is string<32>")
    require(signer.forall(_._1.size == 32), "signer key is opaque[32]")
  }
  /** opType 7 — ALLOW_TRUST: trustor ‖ asset ‖ authorize flag (0 /
    * AUTHORIZED(1) / AUTHORIZED_TO_MAINTAIN_LIABILITIES(2)). */
  case class OpAllowTrust(trustor: Seq[Byte], assetCode: String,
      authorize: Int) extends OpDetail {
    require(trustor.size == 32, "trustor is opaque[32]")
    require(assetCode.getBytes(StandardCharsets.UTF_8).length <= 12,
      "asset code is string<12>")
  }
  /** opType 19 — CLAWBACK: asset ‖ from account (amountStroops above is
    * the clawed-back amount). */
  case class OpClawback(assetCode: String, from: Seq[Byte]) extends OpDetail {
    require(from.size == 32, "from is opaque[32]")
    require(assetCode.getBytes(StandardCharsets.UTF_8).length <= 12,
      "asset code is string<12>")
  }
  /** opType 14 — CREATE_CLAIMABLE_BALANCE: asset ‖ claimants<10>
    * (amountStroops above is the balance amount). The model's claimant
    * subset keeps the destination account and drops the predicate tree —
    * the predicate codec lives in [[ClaimPredicate]] and is exercised by
    * the P12 table, not the wire source
    * (`internal/transform/operation.go:880-884` claimants detail). */
  case class OpCreateClaimableBalance(assetCode: String,
      claimants: Seq[Seq[Byte]]) extends OpDetail {
    require(assetCode.getBytes(StandardCharsets.UTF_8).length <= 12,
      "asset code is string<12>")
    require(claimants.nonEmpty && claimants.size <= 10,
      "claimants is claimants<10>, nonempty")
    require(claimants.forall(_.size == 32), "claimant is opaque[32]")
  }
  /** opType 15 — CLAIM_CLAIMABLE_BALANCE: the v0 balance-id hash
    * (`operation.go:886-896` balance_id detail). */
  case class OpClaimClaimableBalance(balanceId: Seq[Byte]) extends OpDetail {
    require(balanceId.size == 32, "balance id is opaque[32]")
  }
  /** opType 20 — CLAWBACK_CLAIMABLE_BALANCE: same id layout as claim
    * (`operation.go:934-941`). */
  case class OpClawbackClaimableBalance(balanceId: Seq[Byte])
      extends OpDetail {
    require(balanceId.size == 32, "balance id is opaque[32]")
  }
  /** opType 16 — BEGIN_SPONSORING_FUTURE_RESERVES: the sponsored account
    * (`operation.go:898-901`). */
  case class OpBeginSponsoringFutureReserves(sponsoredId: Seq[Byte])
      extends OpDetail {
    require(sponsoredId.size == 32, "sponsored id is opaque[32]")
  }
  /** opType 18 — REVOKE_SPONSORSHIP: the two-arm revoke union
    * (`operation.go:911-921`): LEDGER_ENTRY(0) carries the model ledger
    * key as (entry type, key hash); SIGNER(1) carries (account, signer
    * key). Exactly one arm is populated. */
  case class OpRevokeSponsorship(
      ledgerEntry: Option[(Int, Seq[Byte])],
      signer: Option[(Seq[Byte], Seq[Byte])]) extends OpDetail {
    require(ledgerEntry.isDefined != signer.isDefined,
      "revoke sponsorship populates exactly one union arm")
    require(ledgerEntry.forall(_._2.size == 32), "ledger key is opaque[32]")
    require(signer.forall(s => s._1.size == 32 && s._2.size == 32),
      "signer account and key are opaque[32]")
  }
  /** opType 21 — SET_TRUST_LINE_FLAGS: trustor ‖ asset ‖ clear/set masks
    * (`operation.go:943-955`; zero masks mean "no change", matching the
    * reference's omit-when-zero details). */
  case class OpSetTrustLineFlags(trustor: Seq[Byte], assetCode: String,
      clearFlags: Int, setFlags: Int) extends OpDetail {
    require(trustor.size == 32, "trustor is opaque[32]")
    require(assetCode.getBytes(StandardCharsets.UTF_8).length <= 12,
      "asset code is string<12>")
  }
  /** opType 22 — LIQUIDITY_POOL_DEPOSIT: pool id ‖ per-reserve deposit
    * bounds ‖ the (min, max) XDR rational price band
    * (`operation.go:957-1020`; the result-carried deposited amounts live
    * with the change stream, not the envelope). */
  case class OpLiquidityPoolDeposit(poolId: Seq[Byte],
      maxAmountA: Long, maxAmountB: Long,
      minPriceN: Int, minPriceD: Int,
      maxPriceN: Int, maxPriceD: Int) extends OpDetail {
    require(poolId.size == 32, "pool id is opaque[32]")
    require(minPriceD != 0 && maxPriceD != 0,
      "price denominators must be nonzero")
  }
  /** opType 23 — LIQUIDITY_POOL_WITHDRAW: pool id ‖ per-reserve minimums
    * (amountStroops above is the burned pool-share amount,
    * `operation.go:1022-1062` "shares" detail). */
  case class OpLiquidityPoolWithdraw(poolId: Seq[Byte],
      minAmountA: Long, minAmountB: Long) extends OpDetail {
    require(poolId.size == 32, "pool id is opaque[32]")
  }
  /** opType 24 — INVOKE_HOST_FUNCTION: the HostFunction union tag + the
    * target contract id, absent for UPLOAD_WASM which addresses no
    * contract (`operation.go:1064-1143`; the ScVal argument codec lives
    * with P17/`codec/ScVal`, not the wire source). */
  case class OpInvokeHostFunction(hostFnType: Int,
      contractId: Option[Seq[Byte]],
      params: Seq[Seq[Byte]] = Nil) extends OpDetail {
    require(hostFnType >= 0 && hostFnType <= 3,
      "host function type is 0..3")
    require((hostFnType == 2) == contractId.isEmpty,
      "contract id is present exactly when the function addresses one")
    require(contractId.forall(_.size == 32), "contract id is opaque[32]")
    // InvokeContractArgs.args (ScVal vector) rides the INVOKE_CONTRACT
    // arm only (`operation.go:584-660` serializeParameters input)
    require(hostFnType == 0 || params.isEmpty,
      "invoke arguments ride HOST_FUNCTION_TYPE_INVOKE_CONTRACT only")
  }
  /** opType 25 — EXTEND_FOOTPRINT_TTL: the target TTL ledger extension
    * (`operation.go:1145-1153` extend_to detail). */
  case class OpExtendFootprintTtl(extendTo: Long) extends OpDetail {
    require(extendTo >= 0 && extendTo <= 0xFFFFFFFFL, "extendTo is uint32")
  }

  /** opType values with a typed detail arm. INFLATION(9),
    * END_SPONSORING_FUTURE_RESERVES(17) and RESTORE_FOOTPRINT(26) have
    * VOID XDR bodies, so the flat stand-in arm is already wire-exact for
    * them — all 27 operation types round-trip the wire layout
    * byte-for-byte. */
  val TypedOpTypes: Set[Int] =
    Set(0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12, 13, 14, 15, 16, 18, 19,
      20, 21, 22, 23, 24, 25)

  case class Op(opType: Int, amountStroops: Long, detail: OpDetail = OpGeneric,
      sourceKey: Option[Seq[Byte]] = None) {
    require(sourceKey.forall(_.size == 32), "op source key is opaque[32]")
    detail match {
      case OpCreateAccount(_) =>
        require(opType == 0, "CREATE_ACCOUNT detail requires opType 0")
      case OpPayment(_, _) =>
        require(opType == 1, "PAYMENT detail requires opType 1")
      case _: OpPathPaymentStrictReceive =>
        require(opType == 2, "PATH_PAYMENT_STRICT_RECEIVE detail requires opType 2")
      case _: OpManageSellOffer =>
        require(opType == 3, "MANAGE_SELL_OFFER detail requires opType 3")
      case _: OpManageBuyOffer =>
        require(opType == 12, "MANAGE_BUY_OFFER detail requires opType 12")
      case _: OpPathPaymentStrictSend =>
        require(opType == 13, "PATH_PAYMENT_STRICT_SEND detail requires opType 13")
      case _: OpCreatePassiveSellOffer =>
        require(opType == 4, "CREATE_PASSIVE_SELL_OFFER detail requires opType 4")
      case _: OpChangeTrust =>
        require(opType == 6, "CHANGE_TRUST detail requires opType 6")
      case _: OpAccountMerge =>
        require(opType == 8, "ACCOUNT_MERGE detail requires opType 8")
      case _: OpManageData =>
        require(opType == 10, "MANAGE_DATA detail requires opType 10")
      case _: OpBumpSequence =>
        require(opType == 11, "BUMP_SEQUENCE detail requires opType 11")
      case _: OpSetOptions =>
        require(opType == 5, "SET_OPTIONS detail requires opType 5")
      case _: OpAllowTrust =>
        require(opType == 7, "ALLOW_TRUST detail requires opType 7")
      case _: OpClawback =>
        require(opType == 19, "CLAWBACK detail requires opType 19")
      case _: OpCreateClaimableBalance =>
        require(opType == 14, "CREATE_CLAIMABLE_BALANCE detail requires opType 14")
      case _: OpClaimClaimableBalance =>
        require(opType == 15, "CLAIM_CLAIMABLE_BALANCE detail requires opType 15")
      case _: OpBeginSponsoringFutureReserves =>
        require(opType == 16, "BEGIN_SPONSORING detail requires opType 16")
      case _: OpRevokeSponsorship =>
        require(opType == 18, "REVOKE_SPONSORSHIP detail requires opType 18")
      case _: OpClawbackClaimableBalance =>
        require(opType == 20, "CLAWBACK_CLAIMABLE_BALANCE detail requires opType 20")
      case _: OpSetTrustLineFlags =>
        require(opType == 21, "SET_TRUST_LINE_FLAGS detail requires opType 21")
      case _: OpLiquidityPoolDeposit =>
        require(opType == 22, "LIQUIDITY_POOL_DEPOSIT detail requires opType 22")
      case _: OpLiquidityPoolWithdraw =>
        require(opType == 23, "LIQUIDITY_POOL_WITHDRAW detail requires opType 23")
      case _: OpInvokeHostFunction =>
        require(opType == 24, "INVOKE_HOST_FUNCTION detail requires opType 24")
      case _: OpExtendFootprintTtl =>
        require(opType == 25, "EXTEND_FOOTPRINT_TTL detail requires opType 25")
      case OpGeneric =>
        require(!TypedOpTypes.contains(opType),
          s"opType $opType requires its typed detail arm")
    }
  }

  /** `Memo` union (`Stellar-transaction.x`): NONE / TEXT / ID / HASH /
    * RETURN. Hash arms use Seq[Byte] so case-class equality covers
    * roundtrip asserts. */
  sealed trait Memo
  case object MemoNone extends Memo
  case class MemoText(text: String) extends Memo
  case class MemoId(id: Long) extends Memo
  case class MemoHash(hash: Seq[Byte]) extends Memo
  case class MemoReturn(hash: Seq[Byte]) extends Memo

  case class TimeBounds(minTime: Long, maxTime: Long)
  case class LedgerBounds(minLedger: Long, maxLedger: Long)

  /** `SignerKey` union (`Stellar-types.x`): ED25519(0) / PRE_AUTH_TX(1) /
    * HASH_X(2) / ED25519_SIGNED_PAYLOAD(3 — uint256 key + opaque<64>
    * payload). All key arms are opaque[32]. */
  sealed trait SignerKey {
    def tag: Int
    def key: Seq[Byte]
    require(key.size == 32, "signer key is opaque[32]")
  }
  case class SignerEd25519(key: Seq[Byte]) extends SignerKey { val tag = 0 }
  case class SignerPreAuthTx(key: Seq[Byte]) extends SignerKey { val tag = 1 }
  case class SignerHashX(key: Seq[Byte]) extends SignerKey { val tag = 2 }
  case class SignerEd25519SignedPayload(key: Seq[Byte], payload: Seq[Byte])
      extends SignerKey {
    val tag = 3
    require(payload.size <= 64, "signed payload is opaque<64>")
  }

  /** `Preconditions` union: NONE / TIME / V2. The V2 arm now carries the
    * FULL `PreconditionsV2` member set (`Stellar-transaction.x`): the three
    * optional bounds plus minSeqAge (Duration), minSeqLedgerGap (uint32)
    * and extraSigners (SignerKey<2>). */
  sealed trait Precond
  case object PrecondNone extends Precond
  case class PrecondTime(bounds: TimeBounds) extends Precond
  case class PrecondV2(time: Option[TimeBounds], ledger: Option[LedgerBounds],
      minSeqNum: Option[Long], minSeqAge: Long = 0L,
      minSeqLedgerGap: Long = 0L, extraSigners: Seq[SignerKey] = Nil)
      extends Precond {
    require(extraSigners.size <= 2, "extraSigners is SignerKey<2>")
  }

  /** `SorobanTransactionMetaExt` v1 fee triple (`Stellar-ledger.x`): the
    * resource-fee accounting soroban transactions carry. */
  case class SorobanMeta(
      nonRefundableFeeCharged: Long,
      refundableFeeCharged: Long,
      rentFeeCharged: Long)

  /** The fee-bump envelope shell (`ENVELOPE_TYPE_TX_FEE_BUMP`): the outer
    * feeSource + fee around the inner v1 transaction. */
  case class FeeBump(feeSourceKey: Seq[Byte], fee: Long)

  // TransactionResultCode — the FULL signed enum (`Stellar-transaction.x`)
  val TxFeeBumpInnerSuccess = 1
  val TxSuccess = 0
  val TxFailed = -1
  val TxTooEarly = -2
  val TxTooLate = -3
  val TxMissingOperation = -4
  val TxBadSeq = -5
  val TxBadAuth = -6
  val TxInsufficientBalance = -7
  val TxNoAccount = -8
  val TxInsufficientFee = -9
  val TxBadAuthExtra = -10
  val TxInternalError = -11
  val TxNotSupported = -12
  val TxFeeBumpInnerFailed = -13
  val TxBadSponsorship = -14
  val TxBadMinSeqAgeOrGap = -15
  val TxMalformed = -16
  val TxSorobanInvalid = -17
  /** Enum bounds — decode rejects values outside them loudly. */
  val TxResultCodeMin: Int = TxSorobanInvalid
  val TxResultCodeMax: Int = TxFeeBumpInnerSuccess

  val EnvTx = 2
  val EnvFeeBump = 5

  /** One ledger-entry change attributed to an operation — the wire subset
    * of `TransactionMeta`'s per-operation `LedgerEntryChanges`, the layer
    * the reference's whole change pipeline reads off LedgerCloseMeta
    * (`internal/input/changes.go:20-30`, Pre/Post unwrap in
    * `internal/utils/main.go:836-845`): change kind
    * (CREATED(0)/UPDATED(1)/REMOVED(2)), the LedgerEntryType enum, the
    * owning op index, the ledger-key fingerprint (opaque[32] — the dedup
    * key batch compaction keeps latest-per-key on), lastModifiedLedgerSeq,
    * and the post-state balance (0 where the entry carries none).
    *
    * Entry-type-discriminated pre/post state rides the same record — the
    * slices of `LedgerEntry.Data` the reference's op/trade transforms read
    * back out of the change stream:
    *   - OFFER(2): the offer id plus the PRE-state `Price.N/D` that
    *     `findTradeSellPrice` prices orderbook trades with
    *     (`internal/transform/trade.go:264-279`); 0/0 when the change has
    *     no pre state (CREATED).
    *   - LIQUIDITY_POOL(5): constant-product pre/post reserves + total
    *     shares (the post−pre delta law of
    *     `getLiquidityPoolAndProductDelta`, `operation.go:238-285`) and
    *     the pre-state pool fee bps (`findPoolFee`, `trade.go:306-317`).
    *   - any CREATED entry may carry the sponsoring account
    *     (`Post.SponsoringID()`, the `getSponsor` scan,
    *     `operation.go:296-326`). */
  case class WireChange(kind: Int, entryType: Int, opIndex: Int,
      keyHash: Seq[Byte], lastModified: Long, balance: Long,
      offerId: Long = 0L, prePriceN: Int = 0, prePriceD: Int = 0,
      preReserveA: Long = 0L, preReserveB: Long = 0L, preShares: Long = 0L,
      postReserveA: Long = 0L, postReserveB: Long = 0L, postShares: Long = 0L,
      poolFee: Int = 0, poolId: Option[Seq[Byte]] = None,
      preSponsor: Option[Seq[Byte]] = None,
      postSponsor: Option[Seq[Byte]] = None,
      preSignerSponsors: Seq[(Seq[Byte], Seq[Byte])] = Nil,
      postSignerSponsors: Seq[(Seq[Byte], Seq[Byte])] = Nil) {
    require(kind >= 0 && kind <= 2,
      "change kind is CREATED(0)/UPDATED(1)/REMOVED(2)")
    require(entryType >= 0 && entryType <= 9,
      "entry type is the 10-arm LedgerEntryType enum")
    require(opIndex >= 0, "op index is non-negative")
    require(keyHash.size == 32, "ledger-key fingerprint is opaque[32]")
    require(lastModified >= 0 && lastModified <= 0xFFFFFFFFL,
      "lastModified is uint32")
    require(entryType == 2 ||
      (offerId == 0L && prePriceN == 0 && prePriceD == 0),
      "offer pre-state rides OFFER changes only")
    require(offerId >= 0 && prePriceN >= 0 && prePriceD >= 0,
      "offer id and price components are non-negative")
    require(entryType == 5 ||
      (preReserveA == 0L && preReserveB == 0L && preShares == 0L &&
        postReserveA == 0L && postReserveB == 0L && postShares == 0L &&
        poolFee == 0),
      "constant-product pre/post state rides LIQUIDITY_POOL changes only")
    require(poolFee >= 0, "pool fee bps is non-negative")
    require(poolId.forall(_.size == 32), "pool id is opaque[32]")
    require(entryType == 5 || poolId.isEmpty,
      "a pool id rides LIQUIDITY_POOL changes only")
    require(preSponsor.forall(_.size == 32) &&
      postSponsor.forall(_.size == 32), "sponsors are opaque[32]")
    require(preSponsor.isEmpty || kind != 0,
      "a CREATED entry has no pre state, so no Pre.SponsoringID")
    require(postSponsor.isEmpty || kind != 2,
      "a REMOVED entry has no post state, so no Post.SponsoringID")
    // AccountEntry signer→sponsor maps (`accountSignersSponsors`,
    // effects.go:225-285 diffs the pre/post pair per signer) — the
    // signer-sponsorship-effect substrate, ACCOUNT changes only
    require(entryType == 0 ||
      (preSignerSponsors.isEmpty && postSignerSponsors.isEmpty),
      "signer sponsor maps ride ACCOUNT changes only")
    require((preSignerSponsors ++ postSignerSponsors).forall(p =>
      p._1.size == 32 && p._2.size == 32),
      "signer keys and sponsors are opaque[32]")
    require(preSignerSponsors.isEmpty || kind != 0,
      "a CREATED entry has no pre state, so no pre signer sponsors")
    require(postSignerSponsors.isEmpty || kind != 2,
      "a REMOVED entry has no post state, so no post signer sponsors")
  }

  /** One `ClaimAtom` from the per-op RESULT — the grain the reference's
    * `history_trades` rows come from (`internal/transform/trade.go:44-84`
    * reads ClaimOfferAtom/ClaimLiquidityAtom out of the operation result,
    * not the envelope): the crossed offer's seller + offer id (orderbook
    * arm) or the pool id (LP arm, offerId 0), and the sold/bought asset
    * amounts the fallback price law divides (`trade.go:85-114`). */
  case class WireClaimAtom(opIndex: Int, isPool: Boolean,
      sellerOrPoolId: Seq[Byte], offerId: Long,
      soldCode: String, soldAmount: Long,
      boughtCode: String, boughtAmount: Long) {
    require(opIndex >= 0, "op index is non-negative")
    require(sellerOrPoolId.size == 32, "seller/pool id is opaque[32]")
    require(!isPool || offerId == 0L, "LP atoms carry no offer id")
    require(offerId >= 0L, "offer id is non-negative")
    require(soldCode.getBytes(StandardCharsets.UTF_8).length <= 12 &&
      boughtCode.getBytes(StandardCharsets.UTF_8).length <= 12,
      "asset codes are string<12>")
    require(soldAmount >= 0 && boughtAmount >= 0,
      "claimed amounts are non-negative")
  }

  /** One Soroban contract event attributed to an operation — the wire
    * subset of `SorobanTransactionMeta.events` / `ContractEvent` the
    * reference's P17 export reads (`internal/transform/contract_events.go:
    * 20-104`): the emitting contract id, the 3-arm `ContractEventType`
    * enum (SYSTEM(0)/CONTRACT(1)/DIAGNOSTIC(2)), the topic vector and the
    * data payload — topics and data as raw ScVal XDR blobs, decoded
    * downstream by the same [[graft.codec.ScVal]] codec the fixture-path
    * P17 uses. */
  case class WireContractEvent(opIndex: Int, contractId: Seq[Byte],
      eventType: Int, topics: Seq[Seq[Byte]], data: Seq[Byte]) {
    require(opIndex >= 0, "op index is non-negative")
    require(contractId.size == 32, "contract id is opaque[32]")
    require(eventType >= 0 && eventType <= 2,
      "event type is SYSTEM(0)/CONTRACT(1)/DIAGNOSTIC(2)")
    require(topics.size <= 4, "ContractEvent carries at most 4 topics")
  }

  /** The all-zero ed25519 key — the default `Tx.sourceKey` for fixtures
    * and tests that predate the source-account column. */
  val ZeroKey: Seq[Byte] = Seq.fill[Byte](32)(0)

  case class Tx(feeCharged: Long, resultCode: Int, ops: Seq[Op],
      memo: Memo = MemoNone, cond: Precond = PrecondNone,
      feeBump: Option[FeeBump] = None,
      sorobanMeta: Option[SorobanMeta] = None,
      changes: Seq[WireChange] = Nil,
      claimAtoms: Seq[WireClaimAtom] = Nil,
      sourceKey: Seq[Byte] = ZeroKey,
      sourceMuxedId: Option[Long] = None,
      contractEvents: Seq[WireContractEvent] = Nil) {
    require(sourceKey.size == 32, "source key is opaque[32]")
    require(changes.forall(_.opIndex < ops.size),
      "every change must be attributed to an operation of this transaction")
    require(claimAtoms.forall(_.opIndex < ops.size),
      "every claim atom must be attributed to an operation of this transaction")
    require(contractEvents.forall(_.opIndex < ops.size),
      "every contract event must be attributed to an operation of this transaction")
    /** txSUCCESS and txFEE_BUMP_INNER_SUCCESS both count as applied. */
    def successful: Boolean = resultCode >= 0
  }
  object Tx {
    /** Two-state constructor kept for the flat fixtures/tests that predate
      * result codes. */
    def apply(feeCharged: Long, successful: Boolean, ops: Seq[Op]): Tx =
      Tx(feeCharged, if (successful) TxSuccess else TxFailed, ops)
  }

  /** `LedgerHeader` subset (`Stellar-ledger.x`): the per-ledger monetary and
    * limit fields `transform/ledger.go:41-58` projects into
    * `history_ledgers`. */
  case class HeaderInfo(
      protocolVersion: Int,
      previousLedgerHash: Seq[Byte],
      totalCoins: Long,
      feePool: Long,
      baseFee: Long,
      baseReserve: Long,
      maxTxSetSize: Long) {
    require(previousLedgerHash.size == 32, "previousLedgerHash is opaque[32]")
  }

  /** `LedgerUpgrade` union (`Stellar-ledger.x`): each arm carries one
    * uint32. Tags match the real enum. */
  sealed trait LedgerUpgrade { def tag: Int; def value: Long }
  case class UpgradeVersion(value: Long) extends LedgerUpgrade { val tag = 1 }
  case class UpgradeBaseFee(value: Long) extends LedgerUpgrade { val tag = 2 }
  case class UpgradeMaxTxSetSize(value: Long) extends LedgerUpgrade { val tag = 3 }
  case class UpgradeBaseReserve(value: Long) extends LedgerUpgrade { val tag = 4 }
  case class UpgradeFlags(value: Long) extends LedgerUpgrade { val tag = 5 }

  case class Frame(sequence: Long, closedAtEpochMs: Long, txs: Seq[Tx],
      header: Option[HeaderInfo] = None,
      upgrades: Seq[LedgerUpgrade] = Nil,
      bucketListSizeBytes: Option[Long] = None,
      sorobanFeeWrite1000: Option[Long] = None)

  val VersionV0 = 0
  val VersionV1 = 1
  /** Legacy header-less arm (wire compat with pre-header batch files). */
  val Version = 2

  private def writeXdrString(out: java.io.DataOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    out.writeInt(b.length)
    out.write(b)
    (0 until ((4 - b.length % 4) % 4)).foreach(_ => out.writeByte(0))
  }

  private def readXdrString(buf: ByteBuffer): String = {
    val len = buf.getInt
    val b = new Array[Byte](len)
    buf.get(b)
    buf.position(buf.position() + ((4 - len % 4) % 4))
    new String(b, StandardCharsets.UTF_8)
  }

  private def readOpaque32(buf: ByteBuffer): Seq[Byte] = {
    val b = new Array[Byte](32)
    buf.get(b)
    b.toSeq
  }

  /** Variable-length `opaque<>` (RFC 4506 §4.10): length ‖ bytes ‖ pad. */
  private def writeVarOpaque(out: java.io.DataOutputStream,
      b: Seq[Byte]): Unit = {
    out.writeInt(b.length)
    out.write(b.toArray)
    (0 until ((4 - b.length % 4) % 4)).foreach(_ => out.writeByte(0))
  }

  private def readVarOpaque(buf: ByteBuffer): Seq[Byte] = {
    val len = buf.getInt
    val b = new Array[Byte](len)
    buf.get(b)
    buf.position(buf.position() + ((4 - len % 4) % 4))
    b.toSeq
  }

  /** `.lcmb` batch-file header: a magic int ("LCMB") + a format-version
    * int ahead of the length-prefixed frames. The frame layout is NOT
    * self-describing (optional sections gate on bools, arms on tags), so
    * any layout change — r11 added mandatory result-offer-id bools on the
    * offer ops, entry-type-discriminated change arms, and a
    * contract-event section — silently garbles old files without this.
    * Readers fail fast with a version-mismatch message instead; files
    * must be regenerated on every bump. */
  val LcmbMagic: Int = 0x4C434D42 // "LCMB"
  /** v3 = the round-11 layout (result offer ids, typed change arms,
    * contract events). Bump on ANY frame-layout change. */
  val LcmbVersion: Int = 5

  def encode(f: Frame): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(128)
    val out = new java.io.DataOutputStream(bos)
    // arm selection mirrors how writers pick LedgerCloseMeta versions: a
    // header-less frame keeps the legacy tag, soroban-era extras force V1
    val version = f.header match {
      case None =>
        require(f.bucketListSizeBytes.isEmpty && f.sorobanFeeWrite1000.isEmpty
          && f.upgrades.isEmpty, "header-less frames take the legacy arm")
        Version
      case Some(_) =>
        if (f.bucketListSizeBytes.isDefined || f.sorobanFeeWrite1000.isDefined) {
          // the real LedgerCloseMetaV1 carries totalByteSizeOfBucketList
          // unconditionally — refusing a soroban ext without it keeps
          // decode(encode(f)) == f for every encodable frame (a defaulted
          // 0 would decode back as Some(0) != None)
          require(f.bucketListSizeBytes.isDefined,
            "V1 frames carry totalByteSizeOfBucketList: set bucketListSizeBytes " +
              "whenever sorobanFeeWrite1000 is")
          VersionV1
        } else VersionV0
    }
    out.writeInt(version)
    out.writeInt(f.sequence.toInt) // uint32: ledger seqs are < 2^31 (TOID law)
    out.writeLong(f.closedAtEpochMs)
    f.header.foreach { h =>
      out.writeInt(h.protocolVersion)
      out.write(h.previousLedgerHash.toArray)
      out.writeLong(h.totalCoins)
      out.writeLong(h.feePool)
      out.writeInt(h.baseFee.toInt)
      out.writeInt(h.baseReserve.toInt)
      out.writeInt(h.maxTxSetSize.toInt)
      out.writeInt(f.upgrades.size)
      f.upgrades.foreach { u =>
        out.writeInt(u.tag)
        out.writeInt(u.value.toInt)
      }
      if (version == VersionV1) {
        out.writeLong(f.bucketListSizeBytes.get)
        f.sorobanFeeWrite1000 match {
          case Some(v) => out.writeInt(1); out.writeLong(v)
          case None => out.writeInt(0)
        }
      }
    }
    out.writeInt(f.txs.size)
    f.txs.foreach { t =>
      t.feeBump match {
        case Some(fb) =>
          out.writeInt(EnvFeeBump)
          require(fb.feeSourceKey.size == 32, "feeSource is opaque[32]")
          out.write(fb.feeSourceKey.toArray)
          out.writeLong(fb.fee)
        case None => out.writeInt(EnvTx)
      }
      // inner-envelope sourceAccount (MuxedAccount union): the muxed arm
      // carries the uint64 sub-account id before the ed25519 key
      t.sourceMuxedId match {
        case Some(id) => out.writeInt(1); out.writeLong(id)
        case None => out.writeInt(0)
      }
      out.write(t.sourceKey.toArray)
      t.memo match {
        case MemoNone => out.writeInt(0)
        case MemoText(s) =>
          require(s.getBytes(StandardCharsets.UTF_8).length <= 28, "memo text<28>")
          out.writeInt(1); writeXdrString(out, s)
        case MemoId(id) => out.writeInt(2); out.writeLong(id)
        case MemoHash(h) =>
          require(h.size == 32, "memo hash is opaque[32]")
          out.writeInt(3); out.write(h.toArray)
        case MemoReturn(h) =>
          require(h.size == 32, "memo return is opaque[32]")
          out.writeInt(4); out.write(h.toArray)
      }
      t.cond match {
        case PrecondNone => out.writeInt(0)
        case PrecondTime(tb) =>
          out.writeInt(1); out.writeLong(tb.minTime); out.writeLong(tb.maxTime)
        case PrecondV2(time, ledger, minSeq, minSeqAge, minSeqLedgerGap,
            extraSigners) =>
          out.writeInt(2)
          time match {
            case Some(tb) =>
              out.writeInt(1); out.writeLong(tb.minTime); out.writeLong(tb.maxTime)
            case None => out.writeInt(0)
          }
          ledger match {
            case Some(lb) =>
              out.writeInt(1)
              out.writeInt(lb.minLedger.toInt); out.writeInt(lb.maxLedger.toInt)
            case None => out.writeInt(0)
          }
          minSeq match {
            case Some(n) => out.writeInt(1); out.writeLong(n)
            case None => out.writeInt(0)
          }
          out.writeLong(minSeqAge)
          out.writeInt(minSeqLedgerGap.toInt)
          out.writeInt(extraSigners.size)
          extraSigners.foreach { s =>
            out.writeInt(s.tag)
            out.write(s.key.toArray)
            s match {
              case SignerEd25519SignedPayload(_, payload) =>
                out.writeInt(payload.size)
                out.write(payload.toArray)
                (0 until ((4 - payload.size % 4) % 4)).foreach(_ => out.writeByte(0))
              case _ =>
            }
          }
      }
      require(t.resultCode >= TxResultCodeMin && t.resultCode <= TxResultCodeMax,
        s"result code ${t.resultCode} outside the TransactionResultCode enum")
      out.writeInt(t.resultCode)
      out.writeLong(t.feeCharged)
      t.sorobanMeta match {
        case Some(m) =>
          out.writeInt(1)
          out.writeLong(m.nonRefundableFeeCharged)
          out.writeLong(m.refundableFeeCharged)
          out.writeLong(m.rentFeeCharged)
        case None => out.writeInt(0)
      }
      out.writeInt(t.ops.size)
      t.ops.foreach { o =>
        // optional per-op sourceAccount, like the real Operation's
        // `sourceAccount*` — absent means the tx source acts
        o.sourceKey match {
          case Some(k) => out.writeInt(1); out.write(k.toArray)
          case None => out.writeInt(0)
        }
        out.writeInt(o.opType)
        out.writeLong(o.amountStroops)
        o.detail match {
          case OpCreateAccount(dst) => out.write(dst.toArray)
          case OpPayment(dst, code) =>
            out.write(dst.toArray)
            writeXdrString(out, code)
          case OpPathPaymentStrictReceive(dst, sendCode, destCode, sendMax, got) =>
            out.write(dst.toArray)
            writeXdrString(out, sendCode)
            writeXdrString(out, destCode)
            out.writeLong(sendMax)
            out.writeLong(got)
          case OpPathPaymentStrictSend(dst, sendCode, destCode, destMin, got) =>
            out.write(dst.toArray)
            writeXdrString(out, sendCode)
            writeXdrString(out, destCode)
            out.writeLong(destMin)
            out.writeLong(got)
          case OpManageSellOffer(offerId, selling, buying, n, d, rid) =>
            out.writeLong(offerId)
            writeXdrString(out, selling)
            writeXdrString(out, buying)
            out.writeInt(n)
            out.writeInt(d)
            out.writeInt(if (rid.isDefined) 1 else 0)
            rid.foreach(out.writeLong)
          case OpManageBuyOffer(offerId, selling, buying, n, d, rid) =>
            out.writeLong(offerId)
            writeXdrString(out, selling)
            writeXdrString(out, buying)
            out.writeInt(n)
            out.writeInt(d)
            out.writeInt(if (rid.isDefined) 1 else 0)
            rid.foreach(out.writeLong)
          case OpCreatePassiveSellOffer(selling, buying, n, d, rid) =>
            writeXdrString(out, selling)
            writeXdrString(out, buying)
            out.writeInt(n)
            out.writeInt(d)
            out.writeInt(if (rid.isDefined) 1 else 0)
            rid.foreach(out.writeLong)
          case OpChangeTrust(asset, limit) =>
            writeXdrString(out, asset)
            out.writeLong(limit)
          case OpAccountMerge(dst) =>
            out.write(dst.toArray)
          case OpManageData(name, value) =>
            writeXdrString(out, name)
            out.writeInt(if (value.isDefined) 1 else 0)
            value.foreach { v =>
              out.writeInt(v.size)
              out.write(v.toArray)
              (0 until ((4 - v.size % 4) % 4)).foreach(_ => out.writeByte(0))
            }
          case OpBumpSequence(bumpTo) =>
            out.writeLong(bumpTo)
          case OpSetOptions(dest, clear, set, master, low, med, high,
              domain, signer) =>
            def optInt(v: Option[Int]): Unit = {
              out.writeInt(if (v.isDefined) 1 else 0)
              v.foreach(out.writeInt)
            }
            out.writeInt(if (dest.isDefined) 1 else 0)
            dest.foreach(d => out.write(d.toArray))
            optInt(clear); optInt(set); optInt(master)
            optInt(low); optInt(med); optInt(high)
            out.writeInt(if (domain.isDefined) 1 else 0)
            domain.foreach(writeXdrString(out, _))
            out.writeInt(if (signer.isDefined) 1 else 0)
            signer.foreach { case (k, w) =>
              out.write(k.toArray)
              out.writeInt(w)
            }
          case OpAllowTrust(trustor, asset, authorize) =>
            out.write(trustor.toArray)
            writeXdrString(out, asset)
            out.writeInt(authorize)
          case OpClawback(asset, from) =>
            writeXdrString(out, asset)
            out.write(from.toArray)
          case OpCreateClaimableBalance(asset, claimants) =>
            writeXdrString(out, asset)
            out.writeInt(claimants.size)
            claimants.foreach(c => out.write(c.toArray))
          case OpClaimClaimableBalance(id) =>
            out.write(id.toArray)
          case OpClawbackClaimableBalance(id) =>
            out.write(id.toArray)
          case OpBeginSponsoringFutureReserves(id) =>
            out.write(id.toArray)
          case OpRevokeSponsorship(ledgerEntry, signer) =>
            ledgerEntry match {
              case Some((entryType, key)) =>
                out.writeInt(0)
                out.writeInt(entryType)
                out.write(key.toArray)
              case None =>
                val (account, key) = signer.get
                out.writeInt(1)
                out.write(account.toArray)
                out.write(key.toArray)
            }
          case OpSetTrustLineFlags(trustor, asset, clear, set) =>
            out.write(trustor.toArray)
            writeXdrString(out, asset)
            out.writeInt(clear)
            out.writeInt(set)
          case OpLiquidityPoolDeposit(poolId, maxA, maxB, minN, minD,
              maxN, maxD) =>
            out.write(poolId.toArray)
            out.writeLong(maxA)
            out.writeLong(maxB)
            out.writeInt(minN); out.writeInt(minD)
            out.writeInt(maxN); out.writeInt(maxD)
          case OpLiquidityPoolWithdraw(poolId, minA, minB) =>
            out.write(poolId.toArray)
            out.writeLong(minA)
            out.writeLong(minB)
          case OpInvokeHostFunction(fnType, contractId, params) =>
            out.writeInt(fnType)
            out.writeInt(if (contractId.isDefined) 1 else 0)
            contractId.foreach(c => out.write(c.toArray))
            out.writeInt(params.size)
            params.foreach(writeVarOpaque(out, _))
          case OpExtendFootprintTtl(extendTo) =>
            out.writeInt(extendTo.toInt)
          case OpGeneric =>
        }
      }
      out.writeInt(t.changes.size)
      t.changes.foreach { c =>
        out.writeInt(c.kind)
        out.writeInt(c.entryType)
        out.writeInt(c.opIndex)
        out.write(c.keyHash.toArray)
        out.writeInt(c.lastModified.toInt)
        out.writeLong(c.balance)
        // entry-type-discriminated pre/post arms (XDR-union style): offer
        // pre-state price, LP constant-product pre/post, then the optional
        // pre/post SponsoringIDs (v4 — the sponsorship-effect substrate,
        // `internal/transform/effects.go:287-368` classifies on the pair)
        if (c.entryType == 2) {
          out.writeLong(c.offerId)
          out.writeInt(c.prePriceN)
          out.writeInt(c.prePriceD)
        }
        if (c.entryType == 5) {
          out.writeLong(c.preReserveA); out.writeLong(c.preReserveB)
          out.writeLong(c.preShares)
          out.writeLong(c.postReserveA); out.writeLong(c.postReserveB)
          out.writeLong(c.postShares)
          out.writeInt(c.poolFee)
          out.writeInt(if (c.poolId.isDefined) 1 else 0)
          c.poolId.foreach(p => out.write(p.toArray))
        }
        out.writeInt(if (c.preSponsor.isDefined) 1 else 0)
        c.preSponsor.foreach(s => out.write(s.toArray))
        out.writeInt(if (c.postSponsor.isDefined) 1 else 0)
        c.postSponsor.foreach(s => out.write(s.toArray))
        if (c.entryType == 0) {
          out.writeInt(c.preSignerSponsors.size)
          c.preSignerSponsors.foreach { case (k, s) =>
            out.write(k.toArray); out.write(s.toArray) }
          out.writeInt(c.postSignerSponsors.size)
          c.postSignerSponsors.foreach { case (k, s) =>
            out.write(k.toArray); out.write(s.toArray) }
        }
      }
      out.writeInt(t.claimAtoms.size)
      t.claimAtoms.foreach { ca =>
        out.writeInt(ca.opIndex)
        out.writeInt(if (ca.isPool) 1 else 0)
        out.write(ca.sellerOrPoolId.toArray)
        out.writeLong(ca.offerId)
        writeXdrString(out, ca.soldCode)
        out.writeLong(ca.soldAmount)
        writeXdrString(out, ca.boughtCode)
        out.writeLong(ca.boughtAmount)
      }
      out.writeInt(t.contractEvents.size)
      t.contractEvents.foreach { ev =>
        out.writeInt(ev.opIndex)
        out.writeInt(ev.eventType)
        out.write(ev.contractId.toArray)
        out.writeInt(ev.topics.size)
        ev.topics.foreach(writeVarOpaque(out, _))
        writeVarOpaque(out, ev.data)
      }
    }
    bos.toByteArray
  }

  /** Everything above the tx array: identity, the LedgerHeader subset and
    * per-version extras (header arms only — legacy frames yield None/Nil). */
  case class Meta(sequence: Long, closedAtEpochMs: Long,
      header: Option[HeaderInfo], upgrades: Seq[LedgerUpgrade],
      bucketListSizeBytes: Option[Long], sorobanFeeWrite1000: Option[Long])

  /** Decode the frame's pre-tx section (any version arm), leaving `buf`
    * positioned at the tx count — the cheap path for range-pruned or
    * column-pruned reads that never touch the tx array. */
  def decodeMeta(buf: ByteBuffer): Meta = {
    val v = buf.getInt
    require(v == VersionV0 || v == VersionV1 || v == Version,
      s"unsupported LCM frame version $v")
    val seq = buf.getInt.toLong & 0xFFFFFFFFL
    val closeMs = buf.getLong
    if (v == Version) Meta(seq, closeMs, None, Nil, None, None)
    else {
      val protocol = buf.getInt
      val prev = readOpaque32(buf)
      val totalCoins = buf.getLong
      val feePool = buf.getLong
      val baseFee = buf.getInt.toLong & 0xFFFFFFFFL
      val baseReserve = buf.getInt.toLong & 0xFFFFFFFFL
      val maxTxSetSize = buf.getInt.toLong & 0xFFFFFFFFL
      val nUp = buf.getInt
      val upgrades = (0 until nUp).map { _ =>
        val tag = buf.getInt
        val value = buf.getInt.toLong & 0xFFFFFFFFL
        tag match {
          case 1 => UpgradeVersion(value)
          case 2 => UpgradeBaseFee(value)
          case 3 => UpgradeMaxTxSetSize(value)
          case 4 => UpgradeBaseReserve(value)
          case 5 => UpgradeFlags(value)
          case other => throw new IllegalArgumentException(
            s"bad ledger-upgrade tag $other")
        }
      }
      val (bucket, soroban) =
        if (v == VersionV1) {
          val b = buf.getLong
          val s = if (buf.getInt == 1) Some(buf.getLong) else None
          (Some(b), s)
        } else (None, None)
      Meta(seq, closeMs,
        Some(HeaderInfo(protocol, prev, totalCoins, feePool,
          baseFee, baseReserve, maxTxSetSize)),
        upgrades, bucket, soroban)
    }
  }

  /** Back-compat view of [[decodeMeta]]: (sequence, closeTimeMs). */
  def decodeHeader(buf: ByteBuffer): (Long, Long) = {
    val m = decodeMeta(buf)
    (m.sequence, m.closedAtEpochMs)
  }

  /** Decode the tx array from a buffer positioned after [[decodeHeader]]. */
  def decodeTxs(buf: ByteBuffer): Seq[Tx] = {
    val n = buf.getInt
    (0 until n).map { _ =>
      val feeBump = buf.getInt match {
        case EnvFeeBump =>
          val src = readOpaque32(buf)
          Some(FeeBump(src, buf.getLong))
        case EnvTx => None
        case other => throw new IllegalArgumentException(
          s"unsupported envelope type $other")
      }
      val sourceMuxedId = buf.getInt match {
        case 1 => Some(buf.getLong)
        case 0 => None
        case other => throw new IllegalArgumentException(
          s"bad muxed-account tag $other")
      }
      val sourceKey = readOpaque32(buf)
      val memo = buf.getInt match {
        case 0 => MemoNone
        case 1 => MemoText(readXdrString(buf))
        case 2 => MemoId(buf.getLong)
        case 3 => MemoHash(readOpaque32(buf))
        case 4 => MemoReturn(readOpaque32(buf))
        case other => throw new IllegalArgumentException(s"bad memo tag $other")
      }
      val cond = buf.getInt match {
        case 0 => PrecondNone
        case 1 => PrecondTime(TimeBounds(buf.getLong, buf.getLong))
        case 2 =>
          val time =
            if (buf.getInt == 1) Some(TimeBounds(buf.getLong, buf.getLong))
            else None
          val ledger =
            if (buf.getInt == 1) Some(LedgerBounds(
              buf.getInt.toLong & 0xFFFFFFFFL, buf.getInt.toLong & 0xFFFFFFFFL))
            else None
          val minSeq = if (buf.getInt == 1) Some(buf.getLong) else None
          val minSeqAge = buf.getLong
          val minSeqLedgerGap = buf.getInt.toLong & 0xFFFFFFFFL
          val nSigners = buf.getInt
          val signers = (0 until nSigners).map { _ =>
            val tag = buf.getInt
            val key = readOpaque32(buf)
            tag match {
              case 0 => SignerEd25519(key)
              case 1 => SignerPreAuthTx(key)
              case 2 => SignerHashX(key)
              case 3 =>
                val plen = buf.getInt
                val p = new Array[Byte](plen)
                buf.get(p)
                buf.position(buf.position() + ((4 - plen % 4) % 4))
                SignerEd25519SignedPayload(key, p.toSeq)
              case other => throw new IllegalArgumentException(
                s"bad signer key type $other")
            }
          }
          PrecondV2(time, ledger, minSeq, minSeqAge, minSeqLedgerGap, signers)
        case other => throw new IllegalArgumentException(s"bad precond tag $other")
      }
      val rc = buf.getInt
      if (rc < TxResultCodeMin || rc > TxResultCodeMax)
        throw new IllegalArgumentException(
          s"result code $rc outside the TransactionResultCode enum")
      val fee = buf.getLong
      val soroban =
        if (buf.getInt == 1)
          Some(SorobanMeta(buf.getLong, buf.getLong, buf.getLong))
        else None
      val nOps = buf.getInt
      val ops = (0 until nOps).map { _ =>
        val opSource =
          if (buf.getInt == 1) Some(readOpaque32(buf)) else None
        val opType = buf.getInt
        val amount = buf.getLong
        val detail = opType match {
          case 0 => OpCreateAccount(readOpaque32(buf))
          case 1 => OpPayment(readOpaque32(buf), readXdrString(buf))
          case 2 => OpPathPaymentStrictReceive(readOpaque32(buf),
            readXdrString(buf), readXdrString(buf), buf.getLong, buf.getLong)
          case 13 => OpPathPaymentStrictSend(readOpaque32(buf),
            readXdrString(buf), readXdrString(buf), buf.getLong, buf.getLong)
          case 3 => OpManageSellOffer(buf.getLong,
            readXdrString(buf), readXdrString(buf), buf.getInt, buf.getInt,
            if (buf.getInt == 1) Some(buf.getLong) else None)
          case 12 => OpManageBuyOffer(buf.getLong,
            readXdrString(buf), readXdrString(buf), buf.getInt, buf.getInt,
            if (buf.getInt == 1) Some(buf.getLong) else None)
          case 4 => OpCreatePassiveSellOffer(
            readXdrString(buf), readXdrString(buf), buf.getInt, buf.getInt,
            if (buf.getInt == 1) Some(buf.getLong) else None)
          case 6 => OpChangeTrust(readXdrString(buf), buf.getLong)
          case 8 => OpAccountMerge(readOpaque32(buf))
          case 10 =>
            val name = readXdrString(buf)
            val value =
              if (buf.getInt == 1) {
                val len = buf.getInt
                val b = new Array[Byte](len)
                buf.get(b)
                buf.position(buf.position() + ((4 - len % 4) % 4))
                Some(b.toSeq)
              } else None
            OpManageData(name, value)
          case 11 => OpBumpSequence(buf.getLong)
          case 5 =>
            def optInt(): Option[Int] =
              if (buf.getInt == 1) Some(buf.getInt) else None
            val dest =
              if (buf.getInt == 1) Some(readOpaque32(buf)) else None
            val clear = optInt(); val set = optInt(); val master = optInt()
            val low = optInt(); val med = optInt(); val high = optInt()
            val domain =
              if (buf.getInt == 1) Some(readXdrString(buf)) else None
            val signer =
              if (buf.getInt == 1) Some((readOpaque32(buf), buf.getInt))
              else None
            OpSetOptions(dest, clear, set, master, low, med, high, domain,
              signer)
          case 7 => OpAllowTrust(readOpaque32(buf), readXdrString(buf),
            buf.getInt)
          case 19 => OpClawback(readXdrString(buf), readOpaque32(buf))
          case 14 =>
            val asset = readXdrString(buf)
            val n = buf.getInt
            OpCreateClaimableBalance(asset,
              (0 until n).map(_ => readOpaque32(buf)))
          case 15 => OpClaimClaimableBalance(readOpaque32(buf))
          case 20 => OpClawbackClaimableBalance(readOpaque32(buf))
          case 16 => OpBeginSponsoringFutureReserves(readOpaque32(buf))
          case 18 => buf.getInt match {
            case 0 => OpRevokeSponsorship(
              Some((buf.getInt, readOpaque32(buf))), None)
            case 1 => OpRevokeSponsorship(None,
              Some((readOpaque32(buf), readOpaque32(buf))))
            case other => throw new IllegalArgumentException(
              s"bad revoke-sponsorship tag $other")
          }
          case 21 => OpSetTrustLineFlags(readOpaque32(buf),
            readXdrString(buf), buf.getInt, buf.getInt)
          case 22 => OpLiquidityPoolDeposit(readOpaque32(buf),
            buf.getLong, buf.getLong,
            buf.getInt, buf.getInt, buf.getInt, buf.getInt)
          case 23 => OpLiquidityPoolWithdraw(readOpaque32(buf),
            buf.getLong, buf.getLong)
          case 24 =>
            val fnType = buf.getInt
            val contractId =
              if (buf.getInt == 1) Some(readOpaque32(buf)) else None
            val params = (0 until buf.getInt).map(_ => readVarOpaque(buf))
            OpInvokeHostFunction(fnType, contractId, params)
          case 25 => OpExtendFootprintTtl(buf.getInt.toLong & 0xFFFFFFFFL)
          case _ => OpGeneric
        }
        Op(opType, amount, detail, opSource)
      }
      val nChanges = buf.getInt
      val changes = (0 until nChanges).map { _ =>
        val kind = buf.getInt
        val entryType = buf.getInt
        val opIndex = buf.getInt
        val keyHash = readOpaque32(buf)
        val lastModified = buf.getInt.toLong & 0xFFFFFFFFL
        val balance = buf.getLong
        val (offerId, ppn, ppd) =
          if (entryType == 2) (buf.getLong, buf.getInt, buf.getInt)
          else (0L, 0, 0)
        val (preA, preB, preS, postA, postB, postS, fee, poolId) =
          if (entryType == 5) {
            val t = (buf.getLong, buf.getLong, buf.getLong,
              buf.getLong, buf.getLong, buf.getLong, buf.getInt)
            val pid = if (buf.getInt == 1) Some(readOpaque32(buf)) else None
            (t._1, t._2, t._3, t._4, t._5, t._6, t._7, pid)
          } else (0L, 0L, 0L, 0L, 0L, 0L, 0, None)
        val preSponsor =
          if (buf.getInt == 1) Some(readOpaque32(buf)) else None
        val postSponsor =
          if (buf.getInt == 1) Some(readOpaque32(buf)) else None
        val (preSig, postSig) =
          if (entryType == 0) {
            val pre = (0 until buf.getInt).map(_ =>
              (readOpaque32(buf), readOpaque32(buf)))
            val post = (0 until buf.getInt).map(_ =>
              (readOpaque32(buf), readOpaque32(buf)))
            (pre, post)
          } else (Nil, Nil)
        WireChange(kind, entryType, opIndex, keyHash, lastModified, balance,
          offerId, ppn, ppd, preA, preB, preS, postA, postB, postS, fee,
          poolId, preSponsor, postSponsor, preSig, postSig)
      }
      val nAtoms = buf.getInt
      val atoms = (0 until nAtoms).map { _ =>
        WireClaimAtom(buf.getInt, buf.getInt == 1, readOpaque32(buf),
          buf.getLong, readXdrString(buf), buf.getLong,
          readXdrString(buf), buf.getLong)
      }
      val nEvents = buf.getInt
      val events = (0 until nEvents).map { _ =>
        val oi = buf.getInt
        val et = buf.getInt
        val cid = readOpaque32(buf)
        val topics = (0 until buf.getInt).map(_ => readVarOpaque(buf))
        WireContractEvent(oi, cid, et, topics, readVarOpaque(buf))
      }
      Tx(fee, rc, ops, memo, cond, feeBump, soroban, changes, atoms,
        sourceKey, sourceMuxedId, events)
    }
  }

  def decode(bytes: Array[Byte]): Frame = {
    val buf = ByteBuffer.wrap(bytes)
    val m = decodeMeta(buf)
    Frame(m.sequence, m.closedAtEpochMs, decodeTxs(buf),
      m.header, m.upgrades, m.bucketListSizeBytes, m.sorobanFeeWrite1000)
  }
}
