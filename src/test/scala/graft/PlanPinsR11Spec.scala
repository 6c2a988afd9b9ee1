package graft

/** Physical-plan pins for the round-11 guarantee surfaces: the ANN
  * gates' verification machinery must keep the corpus on the streamed
  * side of every join — the corpus is the 100 TB table, so a
  * SortMergeJoin (corpus shuffle) or a corpus-side broadcast anywhere
  * in the surface is the regression these pins exist to catch. The
  * only exchanges allowed are the tiny res-frame window/aggregate
  * shuffles.
  */
class PlanPinsR11Spec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("x7 LSH gate: every join broadcasts the small side, corpus never sorted-merged") {
    val p = plan("x7_ann_lsh")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x16 IVF gate: same join discipline via the shared surface") {
    val p = plan("x16_ann_ivf")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x89 PQ gate: same join discipline") {
    val p = plan("x89_ann_pq")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x24 recall gate: truth/approx joins stay broadcast") {
    val p = plan("x24_ann_recall")
    assert(!p.contains("SortMergeJoin"), p)
  }
}
