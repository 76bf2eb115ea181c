package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, composed from relational
  * primitives so Catalyst keeps optimizing them (the brief's preference
  * order: compose existing operators before custom plan nodes).
  *
  *  - as-of join: one union + one windowed fill — a single shuffle on the
  *    key, per-partition sort, no per-row probe structure;
  *  - range join: interval bucketization → equi-join — never a
  *    BroadcastNestedLoopJoin, the quadratic shape Spark would otherwise
  *    plan for an inequality join. */
object Temporal {

  /** As-of join: for every left row, the latest right row with
    * `rightTime <= leftTime` on the same key (inclusive, like SQL
    * `ASOF LEFT JOIN ... ON l.t >= r.t`); left rows with no prior right
    * row keep null payloads.
    *
    * Shape: right rows interleave into the left timeline (union), then a
    * running `last(payload, ignoreNulls)` over (time, side) fills each
    * left row from the nearest preceding right row — ONE shuffle on the
    * key and one per-partition sort, the minimal distribution for any
    * time-ordered merge. At equal timestamps the right row sorts first,
    * so a same-instant right row IS visible to the left row.
    *
    * Right rows must be unique per (key, rightTime) — compact first
    * ([[ChangeCompaction.latestByKey]]) if they are not; payload columns
    * fill independently, so right-side nulls inherit the previous match's
    * value for that column. Non-key column names must not collide across
    * the two sides. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val lCols = left.columns.filterNot(keys.contains).toSeq
    val rCols = right.columns.filterNot(keys.contains).toSeq
    require((lCols.toSet & rCols.toSet).isEmpty,
      s"non-key columns must be disjoint: ${lCols.toSet & rCols.toSet}")
    // TimestampType casts to long as whole SECONDS — that would silently
    // collapse sub-second ordering (a right row up to 1s after a left row
    // would match it), so timestamps order on microseconds instead
    def asOrd(df: DataFrame, c: String): Column =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
        case _ => col(c).cast("long")
      }
    val lSide = left.select(
      keys.map(col) ++
        Seq(asOrd(left, leftTime).as("__t"), lit(0).as("__side")) ++
        lCols.map(col) ++
        rCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rSide = right.select(
      keys.map(col) ++
        Seq(asOrd(right, rightTime).as("__t"), lit(1).as("__side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rCols.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionAll(rSide)
      .select(keys.map(col) ++ Seq(col("__side")) ++ lCols.map(col) ++
        rCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .where(col("__side") === 0)
      .drop("__side")
  }

  /** Range join: points against intervals `[startCol, endCol]` on the same
    * key. Each interval explodes into fixed-width time buckets, each point
    * maps to its single bucket, and the join is a plain equi-join on
    * (key, bucket) plus the exact BETWEEN filter — a point matches an
    * interval in exactly one bucket, so no dedup pass is needed.
    * `bucketWidth` trades interval replication (≈ span/width rows) against
    * join selectivity; size it near the typical interval span. */
  def rangeJoinBucketed(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], tCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__b", floor(col(tCol) / bucketWidth))
    val i = intervals.withColumn("__b", explode(sequence(
      floor(col(startCol) / bucketWidth), floor(col(endCol) / bucketWidth))))
    p.join(i, keys :+ "__b")
      .where(col(tCol).between(col(startCol), col(endCol)))
      .drop("__b")
  }
}
