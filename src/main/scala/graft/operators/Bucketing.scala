package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-layout helpers: choose the partitioning at WRITE time so every
  * downstream join/aggregation on the same keys runs with ZERO exchange.
  *
  * This is the Spark-native answer to the reference's fixed batch layout
  * (one ledger per file, 64 000 files per datastore partition,
  * `/root/reference/internal/utils/main.go:981-984`): the reference bakes
  * a layout into the object store so readers can seek without scanning;
  * a bucketed table bakes the HASH layout into the filesystem so joins
  * and aggregations skip the shuffle entirely. At 100 TB the repeated
  * fact-fact join (e.g. operations ⋈ transactions on transaction_id)
  * shuffles terabytes per run unless both sides are bucketed on the key —
  * then every run reads co-located buckets and the exchange disappears
  * from the plan. */
object Bucketing {

  /** Write `df` as a parquet table bucketed AND sorted on `keys`. The
    * bucket hash layout is what kills the exchange; the sortBy keeps each
    * bucket file internally ordered so the per-bucket Sort the planner
    * still inserts (Spark does not trust on-disk order across task
    * boundaries) runs over presorted local data. `oneFilePerBucket`
    * pre-shuffles on the SAME HashPartitioning the bucket layout uses
    * (`repartition(buckets, keys)` — identical Murmur3 pmod law), so each
    * of the `buckets` write tasks owns exactly one bucket and emits one
    * file — full bucket-level parallelism, never a one-task funnel, which
    * is what a 100 TB fact table needs. Disable it to keep the input's
    * natural write parallelism (several files per bucket). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String], oneFilePerBucket: Boolean = true): Unit = {
    val src =
      if (oneFilePerBucket)
        df.repartition(buckets, keys.map(org.apache.spark.sql.functions.col): _*)
      else df
    src.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Equi-join two tables bucketed on the same keys with the same bucket
    * count — planner emits a SortMergeJoin with NO Exchange on either
    * side: the terabyte-scale shuffle a repeated fact-fact join would
    * otherwise pay on every run is paid once, at write time. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
