package graft

/** Round-15 plan pins: q20's surrogate-pk assignment moved off the
  * bench's only single-task global sort (an unpartitioned
  * `row_number()` WindowExec — round-14 verdict item 3) onto
  * [[graft.operators.Scale.denseIds]]'s range-partitioned two-level
  * scan. The pin asserts the executed plan carries NO window operator
  * at all (denseIds is window-free and nothing else in q20 windows),
  * so the pattern can't silently reappear. */
class PlanPinsR15Spec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("q20 assoc-first: no unpartitioned window — no WindowExec at all") {
    val p = plan("q20_assoc_first")
    assert(!p.contains("Window"), p)
    // the fill-back discipline from PlanPinsR14 must survive the change
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
