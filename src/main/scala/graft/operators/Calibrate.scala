package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group percentile-rank calibration: map a raw score to its
  * percent rank within its group — the normalization step that makes
  * quality/length thresholds comparable across languages or sources
  * ("keep the top 30% of each language", not one global cutoff that
  * Gopher-style scores don't support across languages).
  *
  * Semantics are SQL `percent_rank`: `(rank - 1) / (n - 1)` with rank
  * counting strictly-smaller rows; single-row groups get 0.
  *
  * 100 TB shape — the naive window (`percent_rank().over(partitionBy
  * (group))`) sorts EVERY row of a group in one task, and a dominant
  * group (English is 40%+ of a web corpus) makes that task the job.
  * This implementation never windows the raw rows: it aggregates to
  * (group, value) counts first — vocabulary-sized, not corpus-sized —
  * windows the cumulative sum over THAT, and broadcasts/joins the rank
  * back to the scan. Ties collapse into the aggregate, so the
  * per-group window handles distinct values only; the raw-row join is
  * key-partitioned with no single-task stage anywhere. `(rank-1)` and
  * `(n-1)` are exact integers, so the division is the same IEEE op in
  * any engine — no rounding discipline needed downstream.
  */
object Calibrate {

  /** @return df plus `outCol` = percent rank of `valueCol` within
    *         `groupCol` */
  def percentRank(df: DataFrame, groupCol: Column, valueCol: Column,
      outCol: String = "pct"): DataFrame = {
    val counts = df.groupBy(groupCol.as("__g"), valueCol.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = counts
      .withColumn("__below", coalesce(sum(col("__c")).over(w), lit(0L)))
    val totals = df.groupBy(groupCol.as("__g2"))
      .agg(count(lit(1)).as("__n"))
    df.join(ranked, groupCol === col("__g") && valueCol === col("__v"))
      .join(totals, groupCol === col("__g2"))
      .withColumn(outCol,
        when(col("__n") === 1L, lit(0.0))
          .otherwise(col("__below").cast("double") /
            (col("__n") - 1L).cast("double")))
      .drop("__g", "__g2", "__v", "__c", "__below", "__n")
  }
}
