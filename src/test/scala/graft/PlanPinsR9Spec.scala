package graft

/** Physical-plan pins for the round-9 changes: b4's verification pass
  * must stay the cheap shape (broadcast of the 3-row sketch frame, no
  * exact percentile aggregate — the per-group value→count map was the
  * rejected 6-second form). */
class PlanPinsR9Spec extends SparkSpec {

  test("b4 rank-count pass broadcasts the sketch frame, no exact percentile") {
    val plan = SparkEntry.queries("b4_approx_agg")(
      spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // pass-2 join side is the 3-row sketch frame → broadcast, never a
    // shuffled join of lineitem against itself
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the sketches stay approximate: exact Percentile's aggregate
    // (value→count map per group) must not appear
    assert(!plan.toLowerCase.contains("percentile("), plan)
    assert(plan.contains("approx_count_distinct") ||
      plan.contains("HyperLogLog"), plan)
  }

  test("b4 scans read only the three needed lineitem columns") {
    val df = SparkEntry.queries("b4_approx_agg")(
      spark, "/root/testdata/sf0.001")
    val scanned = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(df.queryExecution.executedPlan.toString)
      .map(_.group(1)).toSeq
    assert(scanned.nonEmpty)
    scanned.foreach { cols =>
      val names = cols.split(",").map(_.takeWhile(_ != ':').trim).toSet
      assert(names.subsetOf(
        Set("l_returnflag", "l_partkey", "l_extendedprice")), cols)
    }
  }
}
