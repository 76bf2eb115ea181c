package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec._
import scala.util.Random

class CodecSpec extends AnyFunSuite {
  private def rnd = new Random(42)

  // ---- TOID ----------------------------------------------------------------

  test("toid pack/unpack roundtrip (property)") {
    val r = rnd
    for (_ <- 1 to 500) {
      val l = r.nextLong(Toid.MaxLedger + 1)
      val t = r.nextLong(Toid.MaxTxOrder + 1)
      val o = r.nextLong(Toid.MaxOpIndex + 1)
      assert(Toid.unpack(Toid.pack(l, t, o)) == ((l, t, o)))
    }
  }

  // ---- SAC contract id -----------------------------------------------------

  test("SAC contract id: native XLM on pubnet is the documented C-address") {
    // external vector: the Stellar Asset Contract for native XLM on the
    // public network, as published in Stellar's asset documentation
    assert(SacContractId.contractAddress("native", "", Array.emptyByteArray) ==
      "CAS3J7GYLGXMF6TDJBBYYSE3HQ6BBSMLNUQ34T6TZMYMW2EVH34XOWMA")
  }

  test("SAC contract id: sensitive to code, issuer, network, and type") {
    val issuerA = Hashes.sha256("issuer-a".getBytes("UTF-8"))
    val issuerB = Hashes.sha256("issuer-b".getBytes("UTF-8"))
    val base = SacContractId.contractId("credit_alphanum4", "USDC", issuerA)
    assert(!base.sameElements(SacContractId.contractId("credit_alphanum4", "USDX", issuerA)))
    assert(!base.sameElements(SacContractId.contractId("credit_alphanum4", "USDC", issuerB)))
    assert(!base.sameElements(SacContractId.contractId("credit_alphanum4", "USDC", issuerA,
      SacContractId.TestnetPassphrase)))
    // a 4-char code in the alphanum12 arm pads differently -> different id
    assert(!base.sameElements(SacContractId.contractId("credit_alphanum12", "USDC", issuerA)))
    // deterministic
    assert(base.sameElements(SacContractId.contractId("credit_alphanum4", "USDC", issuerA)))
    assert(SacContractId.contractAddress("credit_alphanum4", "USDC", issuerA).startsWith("C"))
  }

  test("toid ordering matches (ledger, tx, op) lexicographic order") {
    assert(Toid.pack(5, 0, 0) > Toid.pack(4, Toid.MaxTxOrder, Toid.MaxOpIndex))
    assert(Toid.pack(5, 2, 0) > Toid.pack(5, 1, Toid.MaxOpIndex))
    assert(Toid.pack(5, 2, 2) > Toid.pack(5, 2, 1))
  }

  test("synthetic offer id sets bit 62 on (toid+1) and is recognizable") {
    val id = Toid.syntheticOfferId(123, 45, 6)
    assert(Toid.isSynthetic(id))
    assert(!Toid.isSynthetic(Toid.pack(123, 45, 6)))
    assert((id & ~Toid.SyntheticOfferBit) == Toid.pack(123, 45, 6) + 1)
    assert(Toid.ledgerOf(id & ~Toid.SyntheticOfferBit) == 123)
  }

  test("toid rejects out-of-range components") {
    intercept[IllegalArgumentException](Toid.pack(-1, 0, 0))
    intercept[IllegalArgumentException](Toid.pack(0, Toid.MaxTxOrder + 1, 0))
    intercept[IllegalArgumentException](Toid.pack(0, 0, Toid.MaxOpIndex + 1))
  }

  // ---- CRC16 / strkey ------------------------------------------------------

  test("crc16-xmodem known vector") {
    // public check value for CRC-16/XMODEM
    assert(Crc16.checksum("123456789".getBytes("ASCII")) == 0x31c3)
    assert(Crc16.checksum(Array.emptyByteArray) == 0x0000)
  }

  test("strkey encode/decode roundtrip (property)") {
    val r = rnd
    for (_ <- 1 to 200) {
      val p = Array.fill[Byte](32)(0); r.nextBytes(p)
      val s = Strkey.encodeAccountId(p)
      assert(s.head == 'G')
      assert(s.length == 56)
      assert(Strkey.decodeAccountId(s).toSeq == p.toSeq)
    }
  }

  test("strkey version prefixes") {
    val p = Array.fill[Byte](32)(7)
    assert(Strkey.encode(Strkey.Version.Contract, p).head == 'C')
    assert(Strkey.encode(Strkey.Version.LiquidityPool, p).head == 'L')
    assert(Strkey.encode(Strkey.Version.ClaimableBalance, p).head == 'B')
    assert(Strkey.encodeMuxed(p, 42L).head == 'M')
  }

  test("strkey rejects corrupted checksum") {
    val s = Strkey.encodeAccountId(Array.fill[Byte](32)(1))
    val corrupted = s.updated(10, if (s(10) == 'A') 'B' else 'A')
    intercept[IllegalArgumentException](Strkey.decodeAccountId(corrupted))
  }

  test("base32 roundtrip (property)") {
    val r = rnd
    for (n <- 0 to 100) {
      val arr = Array.fill[Byte](n)(0); r.nextBytes(arr)
      // decode ignores padding-less tail bits; roundtrip must preserve bytes
      assert(Strkey.base32Decode(Strkey.base32Encode(arr)).toSeq == arr.toSeq)
    }
  }

  // ---- hashes --------------------------------------------------------------

  test("fnv64a known vectors") {
    // public FNV-1a 64-bit test vectors
    assert(Hashes.fnv64a("") == 0xcbf29ce484222325L)
    assert(Hashes.fnv64a("a") == 0xaf63dc4c8601ec8cL)
    assert(Hashes.fnv64a("foobar") == 0x85944171f73967e8L)
  }

  test("farmhash64 is deterministic and spreads") {
    val h1 = Hashes.farmHash64("USDCGA...issuer...credit_alphanum4")
    assert(h1 == Hashes.farmHash64("USDCGA...issuer...credit_alphanum4"))
    assert(Hashes.farmHash64("a") != Hashes.farmHash64("b"))
  }

  test("sha256 hex known vector") {
    assert(Hashes.sha256Hex("abc".getBytes("ASCII")) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  // ---- amounts -------------------------------------------------------------

  test("stroops → XLM is correctly rounded") {
    assert(Amounts.stroopsToXlm(10000000L) == 1.0)
    assert(Amounts.stroopsToXlm(1L) == 1e-7)
    assert(Amounts.stroopsToXlm(123456789L) == 12.3456789)
    // correctly-rounded parity: equals BigDecimal exact division → double
    val r = rnd
    for (_ <- 1 to 500) {
      val v = r.nextLong(Long.MaxValue / 2)
      val exact = (BigDecimal(v) / BigDecimal(10000000L)).toDouble
      assert(Amounts.stroopsToXlm(v) == exact)
    }
  }

  test("int128 string handles unsigned low word and negatives") {
    assert(Amounts.int128String(0L, 5L) == "5")
    assert(Amounts.int128String(0L, -1L) == "18446744073709551615")
    assert(Amounts.int128String(1L, 0L) == "18446744073709551616")
    assert(Amounts.int128String(-1L, -1L) == "-1")
  }
}
