package graft.codec

import java.nio.ByteBuffer

/** XDR codec for the ledger-close-meta SUBSET the decoded model carries —
  * the source-boundary analog of the reference's XDR unmarshal layer
  * (`/root/reference/internal/utils/main.go:686-705` unmarshals full
  * `xdr.LedgerCloseMeta` from the datastore batch objects). The environment
  * ships no real LCM corpus, so the fixture encodes and the DSv2 source
  * decodes this self-described subset using the same RFC 4506 wire rules as
  * the real thing (4-byte big-endian discriminants/lengths, 8-byte hypers,
  * bool as int), shaped like the public `Stellar-ledger.x` union:
  *
  * {{{
  * LcmFrame:
  *   int    v            // LedgerCloseMeta version tag (always 1 here)
  *   uint32 ledgerSeq    // header.ledgerSeq
  *   uint64 closeTimeMs  // header.scpValue.closeTime, milliseconds here
  *   uint32 nTx          // txProcessing<>
  *   nTx × {
  *     int    resultCode // 0 = txSUCCESS, 1 = txFAILED (result subset)
  *     hyper  feeCharged
  *     uint32 nOps       // envelope operations<>
  *     nOps × { int opType; hyper amountStroops }
  *   }
  * }}}
  *
  * Batch files (`{start}-{end}.lcmb`) are a stream of `uint32 len ‖ frame`
  * records — the length prefix lets a reader skip out-of-range frames
  * without decoding them, mirroring the datastore's per-object framing. */
object Lcm {

  case class Op(opType: Int, amountStroops: Long)
  case class Tx(feeCharged: Long, successful: Boolean, ops: Seq[Op])
  case class Frame(sequence: Long, closedAtEpochMs: Long, txs: Seq[Tx])

  val Version = 1

  def encode(f: Frame): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(64)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(Version)
    out.writeInt(f.sequence.toInt) // uint32: ledger seqs are < 2^31 (TOID law)
    out.writeLong(f.closedAtEpochMs)
    out.writeInt(f.txs.size)
    f.txs.foreach { t =>
      out.writeInt(if (t.successful) 0 else 1)
      out.writeLong(t.feeCharged)
      out.writeInt(t.ops.size)
      t.ops.foreach { o =>
        out.writeInt(o.opType)
        out.writeLong(o.amountStroops)
      }
    }
    bos.toByteArray
  }

  /** Decode just the frame header (version, sequence, close time), leaving
    * `buf` positioned at the tx count — the cheap path for range-pruned or
    * column-pruned reads that never touch the tx array. */
  def decodeHeader(buf: ByteBuffer): (Long, Long) = {
    val v = buf.getInt
    require(v == Version, s"unsupported LCM frame version $v")
    val seq = buf.getInt.toLong & 0xFFFFFFFFL
    val closeMs = buf.getLong
    (seq, closeMs)
  }

  /** Decode the tx array from a buffer positioned after [[decodeHeader]]. */
  def decodeTxs(buf: ByteBuffer): Seq[Tx] = {
    val n = buf.getInt
    (0 until n).map { _ =>
      val code = buf.getInt
      val fee = buf.getLong
      val nOps = buf.getInt
      val ops = (0 until nOps).map(_ => Op(buf.getInt, buf.getLong))
      Tx(fee, successful = code == 0, ops)
    }
  }

  def decode(bytes: Array[Byte]): Frame = {
    val buf = ByteBuffer.wrap(bytes)
    val (seq, closeMs) = decodeHeader(buf)
    Frame(seq, closeMs, decodeTxs(buf))
  }
}
