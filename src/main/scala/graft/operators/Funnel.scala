package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: for each user, how far through a declared
  * event-type sequence they progressed, with the timestamp of each
  * stage — stage i counts only when it happens STRICTLY AFTER stage
  * i-1 (the product-analytics "view → cart → purchase" question, and
  * the session-quality signal an events-derived training set filters
  * on).
  *
  * 100 TB shape: one stage = one user-keyed aggregation joined back to
  * the next stage's event slice — every shuffle is on the SAME user
  * key, so after the first exchange the joins and aggregations reuse
  * the partitioning (Catalyst elides the redundant exchanges). No
  * per-user event list is ever materialized: a hot user with millions
  * of events costs min-aggregation, not memory. K stages = K passes
  * over the (filtered) event slices, each slice pruned to one event
  * type at the scan.
  *
  * Users who never performed the first stage are absent (a funnel
  * starts at its first step); `stage_reached` counts the contiguous
  * prefix completed.
  */
object Funnel {

  /** @param stages event-type sequence, in order (≥ 1, distinct)
    * @return (user, stage_reached, ts_1 … ts_k) — ts_i null when the
    *         stage wasn't reached */
  def stages(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage required")
    require(stages.distinct == stages, s"duplicate stages in $stages")
    val user = col(userCol)
    def slice(t: String) = events.filter(col(typeCol) === t)
      .select(user, col(tsCol).as("__ev_ts"))
    var acc = slice(stages.head).groupBy(user)
      .agg(min(col("__ev_ts")).as("ts_1"))
    stages.zipWithIndex.tail.foreach { case (t, i) =>
      val prev = col(s"ts_$i")
      val carried = (1 to i).map(j => first(col(s"ts_$j")).as(s"ts_$j"))
      acc = acc.join(slice(t), Seq(userCol), "left")
        .groupBy(user)
        .agg(carried.head, (carried.tail :+
          min(when(prev.isNotNull && col("__ev_ts") > prev,
            col("__ev_ts"))).as(s"ts_${i + 1}")): _*)
    }
    val reached = stages.indices.map(i =>
      when(col(s"ts_${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.select((user +: reached.cast("long").as("stage_reached") +:
      stages.indices.map(i => col(s"ts_${i + 1}"))): _*)
  }
}
