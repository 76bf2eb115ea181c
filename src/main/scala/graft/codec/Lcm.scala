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
  * LcmFrame (v2):
  *   int    v            // LedgerCloseMeta version tag (2 = this layout)
  *   uint32 ledgerSeq    // header.ledgerSeq
  *   uint64 closeTimeMs  // header.scpValue.closeTime, milliseconds here
  *   uint32 nTx          // txProcessing<>
  *   nTx × {
  *     int envType       // ENVELOPE_TYPE_TX = 2 | ENVELOPE_TYPE_TX_FEE_BUMP = 5
  *     [envType == 5]:   // the fee-bump shell wrapping the inner tx
  *       opaque feeSource[32]
  *       hyper  feeBumpFee
  *     memo union:       // MEMO_NONE(0) | TEXT(1: string<28>) | ID(2: u64)
  *       int tag         // | HASH(3: opaque[32]) | RETURN(4: opaque[32])
  *     cond union:       // PRECOND_NONE(0) | TIME(1: u64 min,max)
  *       int tag         // | V2(2: TimeBounds* ‖ LedgerBounds* ‖ minSeqNum*)
  *     int    resultCode // signed TransactionResultCode subset:
  *                       // 1 txFEE_BUMP_INNER_SUCCESS, 0 txSUCCESS,
  *                       // -1 txFAILED, -2 txTOO_EARLY, -3 txTOO_LATE
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

  /** `Preconditions` union: NONE / TIME / V2 (the V2 arm keeps the three
    * members the transforms consume; minSeqAge, minSeqLedgerGap and
    * extraSigners stay out of the subset until something reads them). */
  sealed trait Precond
  case object PrecondNone extends Precond
  case class PrecondTime(bounds: TimeBounds) extends Precond
  case class PrecondV2(time: Option[TimeBounds], ledger: Option[LedgerBounds],
      minSeqNum: Option[Long]) extends Precond

  /** The fee-bump envelope shell (`ENVELOPE_TYPE_TX_FEE_BUMP`): the outer
    * feeSource + fee around the inner v1 transaction. */
  case class FeeBump(feeSourceKey: Seq[Byte], fee: Long)

  // TransactionResultCode subset (signed, like the real enum)
  val TxFeeBumpInnerSuccess = 1
  val TxSuccess = 0
  val TxFailed = -1
  val TxTooEarly = -2
  val TxTooLate = -3

  val EnvTx = 2
  val EnvFeeBump = 5

  case class Tx(feeCharged: Long, resultCode: Int, ops: Seq[Op],
      memo: Memo = MemoNone, cond: Precond = PrecondNone,
      feeBump: Option[FeeBump] = None) {
    /** txSUCCESS and txFEE_BUMP_INNER_SUCCESS both count as applied. */
    def successful: Boolean = resultCode >= 0
  }
  object Tx {
    /** Two-state constructor kept for the flat fixtures/tests that predate
      * result codes. */
    def apply(feeCharged: Long, successful: Boolean, ops: Seq[Op]): Tx =
      Tx(feeCharged, if (successful) TxSuccess else TxFailed, ops)
  }

  case class Frame(sequence: Long, closedAtEpochMs: Long, txs: Seq[Tx])

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

  def encode(f: Frame): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(128)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(Version)
    out.writeInt(f.sequence.toInt) // uint32: ledger seqs are < 2^31 (TOID law)
    out.writeLong(f.closedAtEpochMs)
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
        case PrecondV2(time, ledger, minSeq) =>
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
      }
      out.writeInt(t.resultCode)
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
      val feeBump = buf.getInt match {
        case EnvFeeBump =>
          val src = readOpaque32(buf)
          Some(FeeBump(src, buf.getLong))
        case EnvTx => None
        case other => throw new IllegalArgumentException(
          s"unsupported envelope type $other")
      }
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
          PrecondV2(time, ledger, minSeq)
        case other => throw new IllegalArgumentException(s"bad precond tag $other")
      }
      val rc = buf.getInt
      val fee = buf.getLong
      val nOps = buf.getInt
      val ops = (0 until nOps).map(_ => Op(buf.getInt, buf.getLong))
      Tx(fee, rc, ops, memo, cond, feeBump)
    }
  }

  def decode(bytes: Array[Byte]): Frame = {
    val buf = ByteBuffer.wrap(bytes)
    val (seq, closeMs) = decodeHeader(buf)
    Frame(seq, closeMs, decodeTxs(buf))
  }
}
