package graft

import org.apache.spark.sql.functions._

/** Physical-plan pins for the round-6 operators — the properties that
  * make them scale-correct, asserted so a refactor can't silently
  * regress them. spark.range inputs (not LocalRelation literals) so
  * Catalyst can't constant-fold the interesting structure away.
  */
class PlanPinsR6Spec extends SparkSpec {

  private def shuffles(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  test("rrfFuse prunes per query before the exchange (WindowGroupLimit)") {
    val a = spark.range(1000).select((col("id") / 100).cast("long").as("q"),
      col("id").as("d"), (col("id") % 20 + 1).as("r"))
    val plan = graft.ext.Retrieval.rrfFuse(Seq(a, a), "q", "d", "r")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("duplicateExtents shuffles hashes and doc keys, never window text") {
    val docs = spark.range(200).select(col("id"),
      concat_ws(" ", (0 to 11).map(i => concat(lit("w"),
        (col("id") + i) % 40)): _*).as("text"))
    val df = graft.ext.Dedup.duplicateExtents(docs, "id", "text", 3)
    val plan = df.queryExecution.executedPlan.toString
    // frequency agg + doc-keyed window (+ possibly the join side if
    // AQE declines broadcast) — never more
    assert(shuffles(plan) <= 3, plan)
    // the join key is the 64-bit hash, not chunk_text
    assert(!plan.matches("(?s).*SortMergeJoin.*chunk_text.*"), "text joined")
  }

  test("temperatureWeights is one group aggregate plus a broadcast total") {
    val df = spark.range(5000).select(
      (col("id") % 7).cast("string").as("d"), (col("id") % 100 + 1).as("m"))
    val plan = graft.ext.Sampling.temperatureWeights(df, col("d"), col("m"), 0.7)
      .queryExecution.executedPlan.toString
    // the one-row total branch recomputes the (domain-sized) group
    // aggregate rather than caching it — the standard broadcast-stats
    // shape (x55/x56); both exchanges carry only domain-count keys
    assert(shuffles(plan) <= 2, plan)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("momentPartials + combine never reshuffle the partial frame wide") {
    val df = spark.range(5000).select(
      (col("id") % 7).cast("string").as("s"), (col("id") % 100).as("v"))
    val partials = graft.operators.Profile.momentPartials(df, col("s"), col("v"))
    val combined = graft.operators.Profile.momentsCombine(partials)
    // partials: one grouping exchange; combine adds only the global
    // single-partition aggregate (not a hashpartitioning exchange)
    assert(shuffles(combined.queryExecution.executedPlan.toString) === 1,
      combined.queryExecution.executedPlan.toString)
  }
}
