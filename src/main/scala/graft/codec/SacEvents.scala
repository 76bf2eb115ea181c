package graft.codec

/** Stellar-Asset-Contract event parsing over raw ScVal XDR topics/data —
  * the analog of the public stellar/go `contractevents.NewStellarAssetContractEvent`
  * consumed by the reference at `operation.go:1942-1975` (invoke-host-fn
  * `asset_balance_changes`) and `effects.go:1319-1430` (contract
  * credited/debited). Event shapes (public SAC emit conventions):
  *
  *   transfer: [Sym("transfer"), Addr(from), Addr(to), Str(asset)],  data i128
  *   mint:     [Sym("mint"), Addr(admin), Addr(to), Str(asset)],     data i128
  *   burn:     [Sym("burn"), Addr(from), Str(asset)],                data i128
  *   clawback: [Sym("clawback"), Addr(admin), Addr(from), Str(asset)], data i128
  *
  * The asset topic is the canonical "CODE:ISSUER" (or "native"). Defensive:
  * any mismatch → None (arbitrary contracts emit arbitrary events). */
object SacEvents {

  case class SacEvent(eventType: String, from: Option[String],
      to: Option[String], assetType: String, code: String, issuer: String,
      amountHi: Long, amountLo: Long) {
    def amountString: String = Amounts.int128String(amountHi, amountLo)
  }

  private def decodeOpt(b: Array[Byte]): Option[ScVal.V] =
    try Some(ScVal.decode(b)) catch { case _: Exception => None }

  private def addr(v: ScVal.V): Option[String] = v match {
    case ScVal.AddrAccount(k) => Some(Strkey.encodeAccountId(k))
    case ScVal.AddrContract(id) => Some(Strkey.encodeContract(id))
    case _ => None
  }

  private def assetOf(v: ScVal.V): Option[(String, String, String)] = v match {
    case ScVal.Str("native") => Some(("native", "", ""))
    case ScVal.Str(s) if s.count(_ == ':') == 1 =>
      val Array(code, issuer) = s.split(":", 2)
      if (code.isEmpty || issuer.isEmpty) None
      else Some((if (code.length <= 4) "credit_alphanum4"
        else "credit_alphanum12", code, issuer))
    case _ => None
  }

  def parse(topics: Seq[Array[Byte]], data: Array[Byte]): Option[SacEvent] = {
    import ScVal._
    val ts = topics.flatMap(decodeOpt)
    if (ts.length != topics.length) return None
    val amount = decodeOpt(data) match {
      case Some(I128(hi, lo)) => Some((hi, lo))
      case _ => None
    }
    (ts, amount) match {
      case (Seq(Sym("transfer"), f, t, a), Some((hi, lo))) =>
        for { ff <- addr(f); tt <- addr(t); (at, c, i) <- assetOf(a) }
          yield SacEvent("transfer", Some(ff), Some(tt), at, c, i, hi, lo)
      case (Seq(Sym("mint"), _, t, a), Some((hi, lo))) =>
        for { tt <- addr(t); (at, c, i) <- assetOf(a) }
          yield SacEvent("mint", None, Some(tt), at, c, i, hi, lo)
      case (Seq(Sym("burn"), f, a), Some((hi, lo))) =>
        for { ff <- addr(f); (at, c, i) <- assetOf(a) }
          yield SacEvent("burn", Some(ff), None, at, c, i, hi, lo)
      case (Seq(Sym("clawback"), _, f, a), Some((hi, lo))) =>
        for { ff <- addr(f); (at, c, i) <- assetOf(a) }
          yield SacEvent("clawback", Some(ff), None, at, c, i, hi, lo)
      case _ => None
    }
  }
}
