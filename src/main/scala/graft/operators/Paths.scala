package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionized event-path mining: the ordered sequence of event types
  * inside each session ("view>cart>purchase"), and the corpus-wide
  * frequency ranking of those paths — the behavioral n-gram analysis
  * behind funnel discovery (what DO users actually do?), bot detection
  * (machine paths repeat exactly), and interaction-log curation for
  * agent-training data.
  *
  * 100 TB shape: one user-keyed shuffle covers the lag + cumulative
  * session numbering AND the per-session fold (the aggregation reuses
  * the window's partitioning); paths build via the collect-sort-join
  * idiom over ONE session's events (bounded by session length, never a
  * corpus-scale collect). The top-k ranking aggregates path strings —
  * output cardinality is the distinct-path count, and the final k rows
  * come from a TakeOrderedAndProject heap, never a full sort.
  */
object Paths {

  /** @param gap session gap in `tsCol`'s unit (same rule as
    *            sessionization: a longer silence starts a new session)
    * @param tieCol unique tie-break for equal timestamps
    * @return (user, session_id, n_events, path) */
  def sessionPaths(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, gap: Long,
      sep: String = ">"): DataFrame = {
    require(gap > 0, s"gap must be positive, got $gap")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col(tsCol) - col("__prev") > gap, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        array_join(transform(
          array_sort(collect_list(struct(col(tsCol), col(tieCol),
            col(typeCol).as("t")))),
          s => s.getField("t")), sep).as("path"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: counts and conditional probabilities of
    * `prev_type → next_type` across consecutive events — the
    * behavioral-model summary next to [[sessionPaths]] (and the
    * event-stream sibling of the token bigram model).
    *
    * 100 TB shape: one user-keyed window shuffle produces the lag
    * pairs; the pair counting is a partial-aggregated groupBy on the
    * (prev, next) key whose output is |type-alphabet|² rows; per-prev
    * totals derive from the SAME counted frame (no second corpus
    * scan) and join back broadcast. The probability is exact-int /
    * exact-int.
    *
    * @return (prev, next, n, p) — p conditional on prev
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(tieCol),
        col(typeCol).as("next"))
      .withColumn("prev", lag(col("next"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("next"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("prev"))
      .agg(sum(col("n")).as("__tot"))
    pairs.join(broadcast(totals), Seq("prev"))
      .select(col("prev"), col("next"), col("n"),
        (col("n").cast("double") / col("__tot").cast("double")).as("p"))
  }

  /** Global path frequencies, top `k` by (count desc, path). */
  def topPaths(paths: DataFrame, k: Int,
      pathCol: Column = col("path")): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    paths.groupBy(pathCol.as("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }
}
