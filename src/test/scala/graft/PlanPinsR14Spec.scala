package graft

/** Physical-plan pins for the round-14 gates: the headers chain must
  * stay a single-scan expression pipeline (header wire/map conversion
  * is per-row Catalyst work — any join or second scan means the
  * machinery leaked a shuffle), and the assoc-first fill-back must
  * broadcast the dim-sized saved-association frame onto the primary
  * scan rather than shuffling the fact side. */
class PlanPinsR14Spec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("q19 headers: produce->wire->consume->log chain is one scan, no join") {
    val p = plan("q19_headers")
    assert(!p.contains("Join"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("q20 assoc-first: fk fill-back broadcasts the saved-association dim") {
    val p = plan("q20_assoc_first")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Cartesian"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
  }
}
