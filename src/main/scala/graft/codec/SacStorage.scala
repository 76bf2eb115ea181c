package graft.codec

/** The Stellar-Asset-Contract storage walk over raw ScVal XDR — the repo
  * analog of `AssetFromContractData` / `ContractBalanceFromContractData`
  * (`/root/reference/internal/transform/contract_data.go:191-379`), which
  * recover the wrapped classic asset and token balances from contract-data
  * entries written by the SAC (storage layout per the public
  * rs-soroban-env token storage_types).
  *
  * Every probe is defensive: any shape mismatch returns None, never throws —
  * arbitrary contracts share the contract-data table with the SAC. */
object SacStorage {

  case class SacAsset(assetType: String, code: String, issuerKey: Array[Byte])
  case class SacBalance(holder: Array[Byte], amountHi: Long, amountLo: Long,
      authorized: Boolean, clawback: Boolean) {
    def amountString: String = Amounts.int128String(amountHi, amountLo)
  }

  private def decodeOpt(bytes: Array[Byte]): Option[ScVal.V] =
    try Some(ScVal.decode(bytes)) catch { case _: Exception => None }

  /** `AssetFromContractData` (`contract_data.go:191-297`): the entry key must
    * be the contract-instance ledger key; the instance storage must hold an
    * `AssetInfo` enum vec `[Sym(kind), {asset_code: Str, issuer: Bytes}]`;
    * and the entry's contract id must equal the SAC id derived from the
    * recovered asset (the self-check that keeps impostor contracts out). */
  def assetFromContractData(keyXdr: Array[Byte], valXdr: Array[Byte],
      contractId: Array[Byte],
      passphrase: String = SacContractId.PublicPassphrase): Option[SacAsset] = {
    import ScVal._
    for {
      key <- decodeOpt(keyXdr)
      if key == LedgerKeyContractInstance
      inst <- decodeOpt(valXdr).collect { case v: ContractInstance => v }
      assetInfo <- inst.storage.collectFirst {
        case (Vec(Seq(Sym("AssetInfo"))), v) => v
      }
      asset <- assetInfo match {
        case Vec(Seq(Sym("Native"), _)) => // 2-element enum vec, like the credits
          val nativeId = SacContractId.contractId("native", "",
            Array.emptyByteArray, passphrase)
          if (java.util.Arrays.equals(nativeId, contractId))
            Some(SacAsset("native", "", Array.emptyByteArray))
          else None
        case Vec(Seq(Sym(kind), M(Seq(
            (Sym("asset_code"), Str(code)),
            (Sym("issuer"), Bytes(issuer)))))) if code.nonEmpty =>
          val assetType = kind match {
            case "AlphaNum4" => Some("credit_alphanum4")
            case "AlphaNum12" => Some("credit_alphanum12")
            case _ => None
          }
          assetType.flatMap { t =>
            val expected = SacContractId.contractId(t, code, issuer, passphrase)
            if (java.util.Arrays.equals(expected, contractId))
              Some(SacAsset(t, code, issuer))
            else None
          }
        case _ => None
      }
    } yield asset
  }

  /** `ContractBalanceFromContractData` (`contract_data.go:306-379`): key is
    * `[Sym("Balance"), Address(contract holder)]`, value is the 3-entry map
    * `{amount: i128 (non-negative hi), authorized: bool, clawback: bool}`. */
  def contractBalanceFromContractData(keyXdr: Array[Byte],
      valXdr: Array[Byte]): Option[SacBalance] = {
    import ScVal._
    for {
      key <- decodeOpt(keyXdr)
      holder <- key match {
        case Vec(Seq(Sym("Balance"), AddrContract(id))) => Some(id)
        case _ => None
      }
      value <- decodeOpt(valXdr)
      balance <- value match {
        case M(Seq(
            (Sym("amount"), I128(hi, lo)),
            (Sym("authorized"), B(auth)),
            (Sym("clawback"), B(claw)))) if hi >= 0 =>
          Some(SacBalance(holder, hi, lo, auth, claw))
        case _ => None
      }
    } yield balance
  }
}
