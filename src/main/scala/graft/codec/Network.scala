package graft.codec

/** Network selection — the reference's `--testnet`/`--futurenet` flags
  * (`/root/reference/internal/utils/main.go:234-235`) resolved to a network
  * passphrase by `GetEnvironmentDetails` (`main.go:866-895`). The passphrase
  * is the DOMAIN SEPARATOR of the protocol's content addresses: its sha256
  * seeds every transaction signature payload hash
  * ([[StellarXdr.decodeTxEnvelope]]) and every SAC contract-id preimage
  * ([[SacContractId.contractId]]), so the same envelope bytes hash to
  * different ids on different networks. All three passphrases are public
  * protocol constants. */
object Network {

  val PubnetPassphrase = "Public Global Stellar Network ; September 2015"
  val TestnetPassphrase = "Test SDF Network ; September 2015"
  val FuturenetPassphrase = "Test SDF Future Network ; October 2022"

  /** Network name (the reference's `EnvironmentDetails.Network` vocabulary:
    * pubnet | testnet | futurenet) → passphrase. */
  def passphrase(name: String): String = name match {
    case "pubnet" => PubnetPassphrase
    case "testnet" => TestnetPassphrase
    case "futurenet" => FuturenetPassphrase
    case other => throw new IllegalArgumentException(
      s"unknown network: $other (expected pubnet | testnet | futurenet)")
  }

  /** sha256(passphrase) — the 32-byte network id every tx hash mixes in. */
  def id(name: String): Array[Byte] =
    Hashes.sha256(passphrase(name).getBytes("UTF-8"))
}
