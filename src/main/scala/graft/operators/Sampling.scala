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
      rates: Map[String, Double], defaultRate: Double): DataFrame =
    stratifiedThresholds(df, idCol, stratumCol,
      rates.map { case (k, v) => k -> thresholdHex(v) },
      thresholdHex(defaultRate))

  /** Threshold-literal form of [[stratified]] — for callers that derive
    * thresholds by exact integer arithmetic rather than from a double
    * rate. */
  def stratifiedThresholds(df: DataFrame, idCol: String, stratumCol: String,
      thresholds: Map[String, String], defaultThr: String): DataFrame = {
    val thr = coalesce(
      try_element_at(typedLit(thresholds), col(stratumCol)),
      lit(defaultThr))
    df.where(hashKey(col(idCol)) < thr)
  }

  /** Unstratified variant: one global rate. */
  def uniform(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.where(hashKey(col(idCol)) < lit(thresholdHex(rate)))

  /** Per-key document CAP — the over-represented-domain guard of corpus
    * curation: keep at most `k` rows per key (domain, source, dump),
    * deterministically chosen as the k LOWEST sampling keys (ties → lowest
    * id), so the kept set is reproducible across runs and engines — a
    * random-looking but stable "sample" of each oversized group, not its
    * head.
    *
    * Scale shape: ONE shuffle on the key; the rank filter plans as
    * WindowGroupLimit (Spark's rank-limit pushdown), which keeps ≤ k rows
    * per group IN EACH MAP PARTITION before the exchange and again after —
    * so a mega-domain with 10⁹ rows moves ≈ k·partitions rows, never its
    * full volume, and no unbounded per-group buffer exists anywhere (the
    * `collect_list`-and-slice formulation would OOM exactly there). */
  def capPerKey(df: DataFrame, idCol: String, keyCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "cap must be positive")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashKey(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Inverse-frequency mixture (the temperature-0 flattening of dataset
    * mixing): keep rate_s = min_count / count_s, so every stratum
    * contributes the SAME expected number of rows — the smallest stratum
    * survives whole, dominant strata are downsampled to match. Thresholds
    * are exact integers (`min_count * 2^32 / count_s`, integer division):
    * no floating point anywhere, so any engine with sha-256 and integer
    * division reproduces the identical kept-row set.
    *
    * The per-stratum counts come from one hash aggregate collected to the
    * driver — bounded by the number of strata (languages/sources), like a
    * centroid table, then the sample itself is a map-only filter. Counts
    * must stay under 2^31 per stratum (the exact-integer law's headroom);
    * larger corpora sample within shards first. */
  def inverseMixture(df: DataFrame, idCol: String, stratumCol: String): DataFrame =
    inverseMixture(df, idCol, stratumCol, MaxExactCount)

  /** The exact-integer law's headroom: `mn << 32` must fit a signed 64-bit
    * long, so per-stratum counts stay under 2^31. Beyond that, use
    * [[inverseMixtureSharded]]. Exposed as a parameter so the error
    * pathway is testable without 2^31 planted rows. */
  val MaxExactCount: Long = 1L << 31

  /** Bounded per-stratum count collect + the exact-integer-law guard —
    * the shared front half of every whole-corpus mixing law (a mixture
    * table, not the corpus; strata over the bound go through the sharded
    * idiom). */
  private def stratumCounts(df: DataFrame, stratumCol: String,
      maxCount: Long): Map[String, Long] = {
    val counts = df.groupBy(col(stratumCol)).count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    require(counts.nonEmpty, "empty input")
    require(counts.values.max < maxCount,
      s"per-stratum count ${counts.values.max} exceeds the exact-integer " +
        s"law's $maxCount bound - use inverseMixtureSharded for larger corpora")
    counts
  }

  private[graft] def inverseMixture(df: DataFrame, idCol: String,
      stratumCol: String, maxCount: Long): DataFrame = {
    val counts = stratumCounts(df, stratumCol, maxCount)
    val mn = counts.values.min
    val thresholds = counts.map { case (k, n) =>
      k -> (if (n == mn) "g" else f"${(mn << 32) / n}%08x")
    }
    stratifiedThresholds(df, idCol, stratumCol, thresholds, thresholdHex(0.0))
  }

  /** Temperature-flattened dataset mixing at α = 1/2 — the Gopher /
    * multilingual-T5 recipe between natural sampling (α = 1) and
    * [[inverseMixture]]'s uniform flattening (α = 0): the sampled mass of
    * stratum s is ∝ √(its natural mass), so dominant strata are damped
    * but still dominant. Exact-integer law (engine-replayable):
    *
    *   k_s         = ⌊√c_s⌋
    *   threshold_s = (k_min · 2³²) div k_s      (8-hex compare key;
    *                 k_s = k_min ⇒ keep-all)
    *   keep iff sha-key(id) < threshold_s
    *
    * so realized kept mass ≈ c_s · k_min/k_s ∝ √c_s · k_min. ⌊√x⌋ via
    * floor(sqrt(double)) is EXACT for x < 2³¹ in any IEEE engine: sqrt
    * is correctly rounded, and below 2²⁶ the nearest double to a
    * non-square's root sits ≥ 1/(2k) − ulp(k) below the next integer —
    * the same replay license as the rest of the integer family (counts
    * above the bound go through the sharded idiom first, like
    * [[inverseMixtureSharded]]).
    *
    * Scale shape: one bounded per-stratum count collect (strata rows, a
    * mixture table), then a map-only literal-map filter — no shuffle, no
    * join, pushes to the scan. */
  def temperatureMixture(df: DataFrame, idCol: String, stratumCol: String,
      maxCount: Long = MaxExactCount): DataFrame = {
    val counts = stratumCounts(df, stratumCol, maxCount)
    def isqrt(n: Long): Long = math.floor(math.sqrt(n.toDouble)).toLong
    val kmin = isqrt(counts.values.min)
    val thresholds = counts.map { case (k, n) =>
      val ks = isqrt(n)
      k -> (if (ks <= kmin) "g" else f"${(kmin << 32) / ks}%08x")
    }
    stratifiedThresholds(df, idCol, stratumCol, thresholds, thresholdHex(0.0))
  }

  /** Shard assignment for [[inverseMixtureSharded]]: a DIFFERENT slice of
    * the same sha-256 the keep-key uses (hex chars 9-16, where the keep
    * key is chars 1-8), parsed as a 32-bit integer mod `shards`. Hashing
    * — rather than `id mod shards` — makes the shard independent of any
    * structure in the raw ids (striped or batch-assigned ids would skew
    * per-(shard, stratum) counts and pull the realized mixture away from
    * the global mn/n_s law); the disjoint slice keeps it independent of
    * the keep decision too. DuckDB replays it verbatim:
    * `('0x' || substr(sha256(id::VARCHAR), 9, 8))::BIGINT % shards`. */
  def shardKey(id: Column, shards: Int): Column =
    pmod(conv(substring(sha2(id.cast("string"), 256), 9, 8), 16, 10)
      .cast("long"), lit(shards.toLong))

  /** [[inverseMixture]]'s scale path: rows shard deterministically on a
    * uniform id hash ([[shardKey]]) and the inverse-frequency law applies
    * WITHIN each shard — per-(shard, stratum) counts, per-shard min, exact
    * integer thresholds. The uniform hash puts ~n_s/shards rows of stratum
    * s in each shard, so the per-shard keep rate mn_h/n_(s,h) converges to
    * the global mn/n_s while every count the law touches is bounded by the
    * shard size: size `shards` so corpus/shards stays under 2^31 and the
    * law never overflows. The driver-side collect is bounded by strata x
    * shards (a mixture table, not the corpus); the sample itself stays a
    * map-only filter. */
  def inverseMixtureSharded(df: DataFrame, idCol: String, stratumCol: String,
      shards: Int, maxCount: Long = MaxExactCount): DataFrame = {
    require(shards > 0, "shards must be positive")
    val withKey = df.withColumn("__smx",
      concat_ws("|", shardKey(col(idCol), shards), col(stratumCol)))
    val counts = withKey.groupBy(col("__smx")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "empty input")
    require(counts.values.max < maxCount,
      s"per-(shard, stratum) count ${counts.values.max} exceeds the " +
        s"exact-integer law's $maxCount bound - raise shards")
    val mins = counts.groupBy(_._1.takeWhile(_ != '|'))
      .map { case (shard, m) => shard -> m.values.min }
    val thresholds = counts.map { case (k, n) =>
      val mn = mins(k.takeWhile(_ != '|'))
      k -> (if (n == mn) "g" else f"${(mn << 32) / n}%08x")
    }
    stratifiedThresholds(withKey, idCol, "__smx", thresholds, thresholdHex(0.0))
      .drop("__smx")
  }
}
