package graft.codec

/** Stellar strkey encoding: `base32(version-byte ‖ payload ‖ crc16-le)` with no
  * padding. Address families used by the reference
  * (`/root/reference/internal/utils/main.go:33-53`, `transform/ledger.go:72-81`):
  *
  *   - `G…` ed25519 account public key (version 6<<3)
  *   - `M…` muxed account med25519 (12<<3): 32-byte key ‖ 8-byte id
  *   - `S…` seed (18<<3)
  *   - `T…` pre-auth tx (19<<3)
  *   - `X…` sha256 hash (23<<3)
  *   - `C…` contract (2<<3)
  *   - `L…` liquidity pool (11<<3)
  *   - `B…` claimable balance (1<<3)
  */
object Strkey {
  private val Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
  private val Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  object Version {
    val AccountId: Byte = (6 << 3).toByte // 'G'
    val MuxedAccount: Byte = (12 << 3).toByte // 'M'
    val Seed: Byte = (18 << 3).toByte // 'S'
    val PreAuthTx: Byte = (19 << 3).toByte // 'T'
    val HashX: Byte = (23 << 3).toByte // 'X'
    val SignedPayload: Byte = (15 << 3).toByte // 'P'
    val Contract: Byte = (2 << 3).toByte // 'C'
    val LiquidityPool: Byte = (11 << 3).toByte // 'L'
    val ClaimableBalance: Byte = (1 << 3).toByte // 'B'
  }

  /** RFC-4648 base32, no padding (strkey payload lengths never need it). */
  def base32Encode(data: Array[Byte]): String = {
    val sb = new StringBuilder((data.length * 8 + 4) / 5)
    var buffer = 0L
    var bits = 0
    var i = 0
    while (i < data.length) {
      buffer = (buffer << 8) | (data(i) & 0xff)
      bits += 8
      while (bits >= 5) {
        sb.append(Alphabet((buffer >>> (bits - 5)).toInt & 0x1f))
        bits -= 5
      }
      i += 1
    }
    if (bits > 0) sb.append(Alphabet((buffer << (5 - bits)).toInt & 0x1f))
    sb.toString
  }

  def base32Decode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length * 5 / 8)
    var buffer = 0L
    var bits = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      require(c < 128 && Decode(c) >= 0, s"invalid base32 char '$c'")
      buffer = (buffer << 5) | Decode(c)
      bits += 5
      if (bits >= 8) {
        out.write(((buffer >>> (bits - 8)) & 0xff).toInt)
        bits -= 8
      }
      i += 1
    }
    out.toByteArray
  }

  def encode(version: Byte, payload: Array[Byte]): String = {
    val body = new Array[Byte](1 + payload.length)
    body(0) = version
    System.arraycopy(payload, 0, body, 1, payload.length)
    val crc = Crc16.checksumLE(body)
    base32Encode(body ++ crc)
  }

  /** Decode + verify checksum and version byte; returns the payload. */
  def decode(expectedVersion: Byte, s: String): Array[Byte] = {
    val raw = base32Decode(s)
    require(raw.length >= 3, "strkey too short")
    val body = raw.dropRight(2)
    val crc = raw.takeRight(2)
    val expect = Crc16.checksumLE(body)
    require(java.util.Arrays.equals(crc, expect), s"strkey checksum mismatch in $s")
    require(body(0) == expectedVersion,
      s"strkey version mismatch: got ${body(0)}, want $expectedVersion")
    body.drop(1)
  }

  def encodeAccountId(key: Array[Byte]): String = encode(Version.AccountId, key)

  /** [[decode]] of a G-address that returns null instead of throwing —
    * lets columnar callers fall back when a value is not a real strkey
    * (fixture pseudo-issuers, malformed input). */
  def tryDecodeAccount(s: String): Array[Byte] =
    try {
      val key = decode(Version.AccountId, s)
      if (key.length == 32) key else null
    } catch { case _: Exception => null }
  def encodeContract(id: Array[Byte]): String = encode(Version.Contract, id)
  def encodeLiquidityPool(id: Array[Byte]): String = encode(Version.LiquidityPool, id)
  /** B-address: the payload is the marshalled v0 ClaimableBalanceId — type
    * byte 0x00 ‖ 32-byte hash (33 bytes), per the reference's golden
    * `balance_id_strkey` rows. A bare 32-byte hash is prefixed; a 33-byte
    * id passes through. */
  def encodeClaimableBalance(id: Array[Byte]): String =
    encode(Version.ClaimableBalance,
      if (id.length == 32) Array[Byte](0) ++ id else id)

  /** Muxed account M-address: ed25519 key ‖ big-endian uint64 id. */
  def encodeMuxed(key: Array[Byte], id: Long): String = {
    val buf = java.nio.ByteBuffer.allocate(40)
    buf.put(key)
    buf.putLong(id)
    encode(Version.MuxedAccount, buf.array())
  }

  def decodeAccountId(s: String): Array[Byte] = decode(Version.AccountId, s)
}
