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
}
