package graft.codec

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

/** Recursive claimable-balance claimant predicate: XDR binary + JSON render.
  *
  * The reference carries `xdr.ClaimPredicate` verbatim inside `Claimant`
  * (`/root/reference/internal/transform/schema.go:166-170`,
  * `claimable_balance.go:11-21`) and lets the JSON marshaller render the
  * recursive and/or/not/abs-before/rel-before tree. Spark encoders cannot
  * hold a recursive case class, so the model transports the predicate as XDR
  * bytes (the decode layer's natural output) and this codec renders it —
  * same pattern as [[ScVal]]. Wire layout per the public
  * `Stellar-ledger-entries.x` union ClaimPredicate (RFC 4506 rules).
  */
object ClaimPredicate {

  sealed trait P
  case object Unconditional extends P
  case class And(ps: Seq[P]) extends P // XDR bounds <2>
  case class Or(ps: Seq[P]) extends P
  case class Not(p: Option[P]) extends P // XDR optional pointer
  case class AbsBefore(epochSec: Long) extends P
  case class RelBefore(seconds: Long) extends P

  private val TUnconditional = 0
  private val TAnd = 1
  private val TOr = 2
  private val TNot = 3
  private val TAbsBefore = 4
  private val TRelBefore = 5

  def encode(p: P): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    write(out, p)
    out.flush()
    bos.toByteArray
  }

  private def write(out: DataOutputStream, p: P): Unit = p match {
    case Unconditional => out.writeInt(TUnconditional)
    case And(ps) =>
      out.writeInt(TAnd); out.writeInt(ps.length); ps.foreach(write(out, _))
    case Or(ps) =>
      out.writeInt(TOr); out.writeInt(ps.length); ps.foreach(write(out, _))
    case Not(inner) =>
      out.writeInt(TNot)
      inner match {
        case Some(x) => out.writeInt(1); write(out, x)
        case None => out.writeInt(0)
      }
    case AbsBefore(t) => out.writeInt(TAbsBefore); out.writeLong(t)
    case RelBefore(s) => out.writeInt(TRelBefore); out.writeLong(s)
  }

  def decode(bytes: Array[Byte]): P = {
    val buf = ByteBuffer.wrap(bytes)
    val p = read(buf)
    require(!buf.hasRemaining, s"trailing ${buf.remaining()} bytes after predicate")
    p
  }

  private def read(buf: ByteBuffer): P = buf.getInt match {
    case TUnconditional => Unconditional
    case TAnd => And(Seq.fill(buf.getInt)(read(buf)))
    case TOr => Or(Seq.fill(buf.getInt)(read(buf)))
    case TNot => if (buf.getInt == 0) Not(None) else Not(Some(read(buf)))
    case TAbsBefore => AbsBefore(buf.getLong)
    case TRelBefore => RelBefore(buf.getLong)
    case other => throw new IllegalArgumentException(s"ClaimPredicateType $other")
  }

  /** JSON shape of the public stellar/go `xdr.ClaimPredicate` marshaller:
    * abs_before renders both the RFC 3339 instant and the raw epoch. */
  def toJson(p: P): String = p match {
    case Unconditional => """{"unconditional":true}"""
    case And(ps) => ps.map(toJson).mkString("""{"and":[""", ",", "]}")
    case Or(ps) => ps.map(toJson).mkString("""{"or":[""", ",", "]}")
    case Not(None) => """{"not":null}"""
    case Not(Some(x)) => s"""{"not":${toJson(x)}}"""
    case AbsBefore(t) =>
      val iso = java.time.format.DateTimeFormatter.ISO_INSTANT
        .format(java.time.Instant.ofEpochSecond(t))
      s"""{"abs_before":"$iso","abs_before_epoch":"$t"}"""
    case RelBefore(s) => s"""{"rel_before":"$s"}"""
  }

  def jsonFromBinary(bytes: Array[Byte]): String = toJson(decode(bytes))
}
