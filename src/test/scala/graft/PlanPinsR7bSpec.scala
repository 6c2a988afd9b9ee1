package graft

import org.apache.spark.sql.functions._

/** Physical-plan pins for the round-7 continuation operators — the
  * scale-shape claims their scaladocs make, asserted so a refactor
  * can't silently regress them.
  */
class PlanPinsR7bSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("kAnonymityProfile partial-aggregates before its QI exchange") {
    val df = spark.range(2000).select((col("id") % 7).as("a"),
      (col("id") % 11).as("b"))
    val plan = planOf(graft.ext.Privacy.kAnonymityProfile(
      df, Seq(col("a"), col("b")), Seq(2, 5)))
    // map-side combine: a partial_count below the first exchange
    assert(plan.contains("partial_count"), plan)
    // the k rollup runs over the class frame — no window, no sort of
    // raw rows
    assert(!plan.contains("Window"), plan)
  }

  test("noveltyProfile attributes via min-aggregate, never a window sort") {
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", lit("a"), col("id").cast("string"), lit("b"),
        lit("c")).as("text"))
    val plan = planOf(graft.ext.Dedup.noveltyProfile(
      docs.toDF, "doc_id", "text", n = 2))
    assert(!plan.contains("Window"),
      s"first-occurrence must be a min agg (skew-safe), not a window:\n" +
        plan)
    assert(plan.contains("xxhash64"), plan)
  }

  test("winsorize broadcasts its bounds back onto the scan") {
    val df = spark.range(5000).select((col("id") % 3).as("grp"),
      (col("id") % 101).as("v"))
    val plan = planOf(graft.operators.Profile.winsorize(
      df, "grp", "v", 0.125, 0.875))
    assert(plan.contains("BroadcastExchange"), plan)
    // discreteQuantiles' windows run over (group, value) COUNT
    // aggregates: every Window operator must be summing the post-
    // aggregation cnt column — a window regressed onto raw rows would
    // reference the value column and have no cnt to sum
    val winLines = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(winLines.nonEmpty, plan)
    winLines.foreach(l => assert(l.contains("cnt"),
      s"window must run over aggregated counts, got:\n$l"))
  }

  test("intervalOverlap never plans a nested-loop or cartesian join") {
    val a = spark.range(500).select(col("id").as("a_id"),
      (col("id") * 3).as("a_lo"), (col("id") * 3 + 10).as("a_hi"))
    val b = spark.range(500).select(col("id").as("b_id"),
      (col("id") * 5).as("b_lo"), (col("id") * 5 + 8).as("b_hi"))
    val plan = planOf(graft.operators.RangeJoin.intervalOverlap(
      a, b, "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 16L))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("vocabGrowth explodes checkpoints over collapsed frames only") {
    val docs = spark.range(300).select(col("id").as("doc_id"),
      concat_ws(" ", col("id").cast("string"), lit("x y")).as("text"))
    val df = graft.ext.Encoding.vocabGrowth(docs.toDF, "doc_id", "text",
      Seq(10L, 100L))
    val plan = planOf(df)
    // both Generate(explode) nodes must sit ABOVE a HashAggregate
    // (doc counts / type firsts), i.e. the token explode feeds an agg
    // before any checkpoint explode multiplies rows
    val gen = "Generate explode".r.findAllIn(plan).length
    assert(gen >= 2, plan) // token explode + 2 checkpoint explodes may fuse
    assert(plan.contains("partial_min") || plan.contains("min("), plan)
  }
}
