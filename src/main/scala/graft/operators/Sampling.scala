package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-threshold sampling — the training-data mixing
  * primitive: down/up-weight strata (languages, sources, quality buckets)
  * to a target mixture without RNG state, reproducibly across runs and
  * engines, as a map-only filter (no shuffle, no sort, trivially scales:
  * the predicate pushes to the scan like any other filter).
  *
  * The sampling key is the first 8 hex chars of sha256 of the id rendered
  * as a string: a uniform 32-bit value whose lowercase-hex LEXICOGRAPHIC
  * order equals its numeric order, so `key < thresholdHex(rate)` keeps a
  * `rate` fraction and the same rows are kept by any engine with sha256
  * (the DuckDB oracle replays the predicate verbatim). */
object Sampling {

  def hashKey(id: Column): Column =
    substring(sha2(id.cast("string"), 256), 1, 8)

  /** 8-hex-digit threshold under which a uniform 32-bit key falls with
    * probability `rate`; rate ≥ 1 returns a sentinel above every hex
    * digit so everything is kept. */
  def thresholdHex(rate: Double): String = {
    val n = math.max(0L, math.min(1L << 32, math.round(rate * 4294967296.0)))
    if (n >= (1L << 32)) "g" else f"$n%08x"
  }

  /** Per-stratum keep rates (e.g. language quotas), default for unlisted
    * strata. */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val thr = coalesce(
      try_element_at(
        typedLit(rates.map { case (k, v) => k -> thresholdHex(v) }),
        col(stratumCol)),
      lit(thresholdHex(defaultRate)))
    df.where(hashKey(col(idCol)) < thr)
  }

  /** Unstratified variant: one global rate. */
  def uniform(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.where(hashKey(col(idCol)) < lit(thresholdHex(rate)))
}
