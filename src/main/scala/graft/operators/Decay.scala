package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponential time-decay aggregation: per key, the sum of
  * `exp(-(t_ref - ts) / tau)` over its events — the standard recency
  * weighting behind activity scores, decayed engagement counters, and
  * the freshness feature a training pipeline attaches to user/source
  * rows. An event `tau` ago contributes 1/e; "now" contributes 1.
  *
  * 100 TB shape: the reference time reduces to ONE row (broadcast
  * back), the weight is a scan-side `exp`, and the score is one
  * key-partitioned aggregation — the same partial-aggregate shuffle as
  * any `groupBy().sum()`. Computing `t_ref` from the data (max ts)
  * keeps the operator deterministic and engine-replicable; pass an
  * explicit reference to pin it to a wall clock instead.
  */
object Decay {

  /** @param tsCol   numeric event time (any fixed unit)
    * @param tau     decay constant in the SAME unit as `tsCol`
    * @param refTime optional explicit reference time; defaults to the
    *                observed max (one extra tiny job's worth of plan)
    * @return (key, n_events, score) */
  def recencyScore(df: DataFrame, keyCol: String, tsCol: String,
      tau: Double, refTime: Option[Column] = None): DataFrame = {
    require(tau > 0, s"tau must be positive, got $tau")
    val withRef = refTime match {
      case Some(r) => df.withColumn("__ref", r)
      case None =>
        df.crossJoin(broadcast(df.agg(max(col(tsCol)).as("__ref"))))
    }
    withRef
      .select(col(keyCol),
        exp((col(tsCol) - col("__ref")).cast("double") / tau).as("__w"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("__w")).as("score"))
  }
}
