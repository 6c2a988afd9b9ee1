package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing event-time window aggregates: for every event, aggregate
  * the SAME key's events inside `[t - windowSize, t]` — rolling
  * engagement counters, rate-limit features, burst detection; the
  * per-event form of what [[graft.operators.Decay]] collapses to one
  * row per key.
  *
  * 100 TB shape: ONE shuffle on the key; within each partition Spark's
  * WindowExec advances a sliding RANGE frame over the ts-sorted rows
  * with two pointers — O(rows) per key total, never re-scanning the
  * window per row, and nothing is ever collected per key. Frame bounds
  * compare the raw numeric timestamp, so rows with EQUAL ts are frame
  * peers (RANGE semantics) — deterministic under ts ties in any
  * engine, where a ROWS frame would depend on partition order.
  */
object Rolling {

  /** @param windowSize trailing width in `tsCol`'s unit (inclusive)
    * @param aggs       (output name, aggregate over the frame) pairs,
    *                   e.g. `"n_1h" -> count(lit(1))`
    * @return df plus one column per agg */
  def trailing(df: DataFrame, keyCol: String, tsCol: String,
      windowSize: Long, aggs: Seq[(String, Column)]): DataFrame = {
    require(windowSize >= 0, s"windowSize must be >= 0, got $windowSize")
    require(aggs.nonEmpty, "at least one aggregate required")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rangeBetween(-windowSize, Window.currentRow)
    // one select, not per-agg withColumn: all frames are identical, so
    // this plans as ONE Window operator (a single sorted pass) instead
    // of one stacked Window node per aggregate
    df.select(col("*") +: aggs.map { case (name, a) =>
      a.over(w).as(name) }: _*)
  }
}
