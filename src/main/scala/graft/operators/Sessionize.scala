package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event log — the classic behavioral
  * grouping every events pipeline needs (and the window shape the
  * reference's fixed 64-ledger batching cannot express).
  *
  * Spark-first shape: the built-in `session_window` grouping — a hash
  * aggregate whose grouping key is the merged session interval. One
  * shuffle on the user key; sessions merge inside the aggregate, so no
  * self-join, no window-function sort over the full log, and the SAME
  * declarative plan runs incrementally under Structured Streaming with
  * state eviction at the watermark (`session_window` is streaming-native).
  *
  * Boundary law (matches `session_window`): an event exactly `gap` after
  * its predecessor starts a NEW session — windows are half-open
  * `[start, last+gap)`, and touching-but-not-overlapping windows do not
  * merge. The SQL replay must therefore break on `diff >= gap`. */
object Sessionize {

  /** Sessions per `userCol` with inactivity timeout `gap`. `tsCol` must be
    * a timestamp column; output bounds are epoch-micros longs (exact). */
  def sessions(events: DataFrame, userCol: String, tsCol: Column,
      gap: String, aggs: Seq[Column] = Nil): DataFrame = {
    val base = Seq(
      count(lit(1)).as("n_events"),
      unix_micros(min(tsCol)).as("session_start_us"),
      unix_micros(max(tsCol)).as("session_end_us"))
    events
      .groupBy(col(userCol), session_window(tsCol, gap).as("__w"))
      .agg(base.head, (base.tail ++ aggs): _*)
      .drop("__w")
  }
}
