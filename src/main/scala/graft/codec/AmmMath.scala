package graft.codec

/** Constant-product AMM math with exact (BigInt) rational arithmetic —
  * the recomputation behind the trade `rounding_slippage` column
  * (`/root/reference/internal/transform/trade.go:350-399`, which calls the
  * public `orderbook.CalculatePoolPayout` from stellar/go).
  *
  * payout = ⌊ B·x·f / (A·10000 + x·f) ⌋ with f = 10000 − feeBips; the
  * rounding slippage is the relative loss of the floor against the exact
  * rational payout, in basis points, rounded up. */
object AmmMath {

  /** @return Some((payout, roundingSlippageBips)) or None when the pool
    * cannot pay out (zero/negative payout or reserves). */
  def poolPayout(reservesDeposited: Long, reservesDisbursed: Long,
      deposit: Long, feeBips: Long): Option[(Long, Long)] = {
    if (reservesDeposited <= 0 || reservesDisbursed <= 0 || deposit <= 0 ||
      feeBips < 0 || feeBips >= 10000) return None
    val f = BigInt(10000 - feeBips)
    val x = BigInt(deposit)
    val num = BigInt(reservesDisbursed) * x * f
    val den = BigInt(reservesDeposited) * 10000 + x * f
    val payout = num / den
    if (payout <= 0) None
    else {
      val remainder = num - payout * den // exact − floored, scaled by den
      val slipDen = payout * den
      val slippage = (remainder * 10000 + slipDen - 1) / slipDen // ceil
      Some((payout.toLong, slippage.toLong))
    }
  }

  def roundingSlippageBips(reservesDeposited: Long, reservesDisbursed: Long,
      amount: Long, feeBips: Long): Option[Long] =
    poolPayout(reservesDeposited, reservesDisbursed, amount, feeBips).map(_._2)

  /** Slippage with the reference's sentinel workaround for stellar/go#4203
    * (`trade.go:373-393`): when the payout is not computable, strict-receive
    * emits MaxInt64 (so the trade is excluded as max slippage) and strict-send
    * emits MinInt64. */
  def roundingSlippageOrSentinel(reservesDeposited: Long, reservesDisbursed: Long,
      amount: Long, feeBips: Long, strictReceive: Boolean): Long =
    roundingSlippageBips(reservesDeposited, reservesDisbursed, amount, feeBips)
      .getOrElse(if (strictReceive) Long.MaxValue else Long.MinValue)
}
