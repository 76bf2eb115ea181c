package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation operators. Spark's own defenses cover most
  * cases — map-side partial aggregation absorbs skewed algebraic
  * aggregates, AQE splits skewed sort-merge partitions at runtime — but
  * two shapes still hot-spot a single task and need the salted form:
  * a skewed equi-join whose build side is too large to broadcast, and a
  * distinct-style aggregate whose per-key state cannot partial-combine. */
object Skew {

  /** Salted equi-join for a skewed probe side against a build side too
    * large (or stateful) to broadcast: every probe row gets a
    * deterministic shard in [0, salts) hashed from `rowKey` (retries and
    * speculative tasks re-derive the same shard), the build side is
    * replicated once per shard, and the join key becomes (keys, shard) —
    * so a hot key's rows spread over `salts` tasks instead of one.
    * Output rows are exactly the plain join's. Cost: build side shuffles
    * `salts`× its size; pick `salts` ≈ hot-key-rows / target-task-rows.
    *
    * Reach for this AFTER AQE: `spark.sql.adaptive.skewJoin` already
    * splits oversized sort-merge partitions at runtime with no code
    * change and no build-side replication. Salting earns its cost where
    * AQE cannot rebalance — the skewed join feeds a stateful/windowed
    * operator in the same stage, the plan is not a sort-merge join, AQE
    * is off, or the layout must be deterministic independent of runtime
    * size stats (SkewSpec measures the effect per task). */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      rowKey: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(col(rowKey)), lit(salts)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Exact distinct count per (possibly skewed) key in two phases: the
    * value→shard map is a function of the VALUE, so the shards partition
    * each key's value set and the per-shard distinct counts sum to the
    * exact global distinct count — no overlap, no approximation. Phase 1
    * spreads the hottest key's distinct-state over `salts` tasks; phase 2
    * is a plain map-side-combinable sum of at most `salts` rows per key. */
  def saltedDistinctCount(df: DataFrame, keyCols: Seq[String],
      valueCol: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn("__shard", pmod(xxhash64(col(valueCol)), lit(salts)))
      .groupBy((keyCols :+ "__shard").map(col): _*)
      .agg(count_distinct(col(valueCol)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__partial").as("distinct_count"))
  }
}
