package graft.codec

/** Stellar Asset Contract (SAC) id derivation — the codec behind the
  * reference's asset↔contract matching in
  * `/root/reference/internal/transform/contract_data.go:191-297`
  * (`asset.ContractID(passphrase)` from the public stellar/go xdr package).
  *
  * The id is `sha256(XDR(HashIDPreimage))` with the preimage assembled from
  * public, fixed XDR layout (all ints big-endian 4-byte):
  *
  * {{{
  * int32(ENVELOPE_TYPE_CONTRACT_ID = 8)
  * ‖ networkId                       // sha256(network passphrase), 32 bytes
  * ‖ int32(CONTRACT_ID_PREIMAGE_FROM_ASSET = 1)
  * ‖ Asset XDR:
  *     native:      int32(0)
  *     alphanum4:   int32(1) ‖ code zero-padded to 4  ‖ int32(0) ‖ issuer(32)
  *     alphanum12:  int32(2) ‖ code zero-padded to 12 ‖ int32(0) ‖ issuer(32)
  * }}}
  *
  * (the inner `int32(0)` is PUBLIC_KEY_TYPE_ED25519 of the issuer AccountID).
  * Rendered as a `C…` strkey address. */
object SacContractId {

  val PublicPassphrase = "Public Global Stellar Network ; September 2015"
  val TestnetPassphrase = "Test SDF Network ; September 2015"

  val EnvelopeTypeContractId = 8
  val PreimageFromAsset = 1

  def networkId(passphrase: String): Array[Byte] =
    Hashes.sha256(passphrase.getBytes("UTF-8"))

  private def int32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def padded(code: String, len: Int): Array[Byte] = {
    val raw = code.getBytes("UTF-8")
    require(raw.length <= len, s"asset code too long for alphanum$len: $code")
    java.util.Arrays.copyOf(raw, len)
  }

  /** XDR serialization of an Asset (`asset_type` in the reference's string
    * vocabulary: native | credit_alphanum4 | credit_alphanum12). */
  def assetXdr(assetType: String, code: String, issuerKey: Array[Byte]): Array[Byte] =
    assetType match {
      case "native" => int32(0)
      case "credit_alphanum4" =>
        require(issuerKey.length == 32, "issuer key must be 32 bytes")
        int32(1) ++ padded(code, 4) ++ int32(0) ++ issuerKey
      case "credit_alphanum12" =>
        require(issuerKey.length == 32, "issuer key must be 32 bytes")
        int32(2) ++ padded(code, 12) ++ int32(0) ++ issuerKey
      case other => throw new IllegalArgumentException(s"unknown asset type: $other")
    }

  /** 32-byte contract id of the SAC for this asset on this network. */
  def contractId(assetType: String, code: String, issuerKey: Array[Byte],
      passphrase: String = PublicPassphrase): Array[Byte] =
    Hashes.sha256(
      int32(EnvelopeTypeContractId) ++ networkId(passphrase) ++
        int32(PreimageFromAsset) ++ assetXdr(assetType, code, issuerKey))

  /** `C…` strkey address of the SAC. */
  def contractAddress(assetType: String, code: String, issuerKey: Array[Byte],
      passphrase: String = PublicPassphrase): String =
    Strkey.encodeContract(contractId(assetType, code, issuerKey, passphrase))
}
