package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis: bucket every user by the period of their
  * FIRST event (the cohort), then count distinct users active at each
  * period offset after it — the (cohort, offset) retention matrix
  * behind engagement dashboards, and the freshness/churn audit a
  * training pipeline runs over interaction logs before weighting them.
  *
  * 100 TB shape: first-seen is one key-partitioned min; the join back
  * reuses that partitioning (both sides hash on the user key, AQE
  * broadcasts the first-seen side when it fits); the final matrix
  * aggregation's key space is periods² — bounded by the time span, not
  * the data. `countDistinct` is Spark's two-phase partial-distinct
  * aggregate, so the exchange carries map-side-deduplicated (cohort,
  * offset, user) triples, not raw events.
  *
  * Period arithmetic is INTEGER floor division (`DIV`) on the raw
  * numeric timestamp: nanosecond epochs (~1.7e18) exceed double's 2^53
  * mantissa, so a float path would misassign events within ~256 ns of
  * a period boundary — the kind of silent off-by-one that only shows
  * up as an irreproducible matrix cell.
  */
object Cohorts {

  /** @param tsCol    numeric event time (any fixed unit, non-negative)
    * @param periodNs period width in `tsCol`'s unit
    * @return (cohort, period_offset, active_users); cohort is the
    *         floor-div period index of the user's first event,
    *         period_offset >= 0 */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      periodNs: Long): DataFrame = {
    require(periodNs > 0, s"periodNs must be positive, got $periodNs")
    val first = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("__first"))
    events.select(col(userCol), col(tsCol).as("__ts"))
      .join(first, Seq(userCol))
      .select(col(userCol),
        expr(s"__first DIV $periodNs").as("cohort"),
        (expr(s"__ts DIV $periodNs") -
          expr(s"__first DIV $periodNs")).as("period_offset"))
      .groupBy(col("cohort"), col("period_offset"))
      .agg(countDistinct(col(userCol)).as("active_users"))
  }
}
