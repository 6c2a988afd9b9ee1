package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column completeness and cardinality in
  * ONE pass over the table — the report a pipeline runs on every new
  * data drop before trusting it (and the input to partition/skew
  * decisions: n_distinct is the first question every join asks).
  *
  * Output is long format, one row per column:
  * (col_name, n_rows, n_nulls, n_distinct).
  *
  * Scale: all counts ride a single aggregation. Multiple exact
  * distincts make Catalyst plan an Expand (one input row fans to one
  * row per distinct aggregate before the shuffle) — exact but N×
  * expansion; `approx = true` switches to HyperLogLog++ sketches,
  * which keeps the pre-shuffle row count flat and is the right mode
  * at 100 TB (the exact mode is for oracle-checkable reports and
  * modest tables).
  */
object Profile {

  def table(df: DataFrame, cols: Seq[String],
      approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (approx) approx_count_distinct(col(c))
        else countDistinct(col(c))).as(s"__nd_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** Fixed-width histogram of a numeric column: `nBuckets` equal
    * ranges over the observed [min, max], the distribution report
    * that pairs with [[table]] (and the input to choosing packing/
    * filter thresholds). Two jobs: a (min, max) aggregate whose ONE
    * row broadcasts back, then a scan-side bucket assignment and a
    * bucket-keyed count — the shuffle carries at most `nBuckets` keys
    * per partition. The top edge closes ([min,max] fully covered:
    * x = max lands in the last bucket); a constant column degenerates
    * to one full bucket of width 0. Empty buckets are absent from the
    * output (a corpus-scale histogram is the small report, not a
    * dense vector).
    *
    * Bucket arithmetic is `floor((x - min) / width)` in double — both
    * engines in the oracle pair compute it identically, so boundary
    * landings are deterministic. */
  def histogram(df: DataFrame, valueCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    val x = col(valueCol).cast("double")
    val stats = df.filter(x.isNotNull)
      .agg(min(x).as("__mn"), max(x).as("__mx"))
    val width = (col("__mx") - col("__mn")) / nBuckets
    val bucket = when(col("__mx") === col("__mn"), lit(0L)).otherwise(
      least(floor((x - col("__mn")) / width), lit(nBuckets - 1L))
        .cast("long"))
    df.filter(x.isNotNull).crossJoin(broadcast(stats))
      .select(bucket.as("bucket"), col("__mn"), width.as("__w"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        first(col("__mn") + col("bucket") * col("__w")).as("lo"),
        first(col("__mn") + (col("bucket") + 1) * col("__w")).as("hi"))
  }

  /** Per-group z-score standardization: `(x - mean_g) / stddev_g`
    * (sample stddev), the feature-scaling step before any
    * distance/threshold logic that mixes groups. One group-keyed
    * aggregation (group-count rows) joined back — broadcast under AQE
    * when the group count is small — then a scan-side projection.
    * A group with fewer than 2 rows or zero variance yields null z
    * (explicitly, on both engines — Spark's stddev NaN is normalized
    * away). Output: input columns + `z`. */
  def standardize(df: DataFrame, valueCol: String,
      groupCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val stats = df.groupBy(col(groupCol))
      .agg(avg(x).as("__mean"), stddev_samp(x).as("__sd"))
    df.join(stats, Seq(groupCol))
      .withColumn("z",
        when(col("__sd").isNull || isnan(col("__sd")) ||
          col("__sd") === 0.0, lit(null).cast("double"))
          .otherwise((x - col("__mean")) / col("__sd")))
      .drop("__mean", "__sd")
  }
}
