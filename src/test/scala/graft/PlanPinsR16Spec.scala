package graft

/** Round-16 plan pins (verdict item 4): the LAST two unpartitioned
  * windows — vocab dense-id assignment (ext/Encoding.topKVocab) and
  * the packing prefix-sum's cross-bucket offsets (ext/Packing
  * .prefixSum) — moved onto the shared window-free helpers
  * ([[graft.operators.Scale.denseIds]] /
  * [[graft.operators.Scale.exclusiveRunningSum]]). Both frames were
  * provably bounded, but q20 proved the bare-`Window.orderBy` pattern
  * gets copied onto corpus-sized frames; with these pins no executed
  * plan in the suite carries an unpartitioned WindowExec and no main
  * source file calls `Window.orderBy` without a partitionBy. */
class PlanPinsR16Spec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  /** WindowExec prints "Window [..], [orderSpec]" with NO partition
    * spec when unpartitioned — three bracket groups when partitioned,
    * two when not. Grep the executed plan for a window operator line
    * lacking a partition spec. */
  private def unpartitionedWindows(p: String): Seq[String] =
    p.linesIterator.filter { l =>
      val t = l.dropWhile(c => c == ' ' || c == ':' || c == '+' ||
        c == '-' || c == '*' || c == '(' || c.isDigit || c == ')')
      t.startsWith("Window ") || t.startsWith("RunningWindowFunction ")
    }.filter(l => !l.contains("], [") ||
      l.indexOf("], [") == l.lastIndexOf("], [")).toSeq

  test("x14_vocab: dense vocab ids are window-free (denseIds, not row_number)") {
    val p = plan("x14_vocab")
    assert(unpartitionedWindows(p).isEmpty, p)
  }

  test("x93_token_ids: the encoded-corpus plan carries no unpartitioned window") {
    val p = plan("x93_token_ids")
    assert(unpartitionedWindows(p).isEmpty, p)
  }

  test("x29_pack: prefix-sum bucket offsets are window-free across buckets") {
    val p = plan("x29_pack")
    assert(unpartitionedWindows(p).isEmpty, p)
    // the within-bucket running sum is PARTITIONED by design — it must
    // still be there (the parallel half of the two-level scan)
    assert(p.contains("Window"), p)
  }

  // The round-16 plan audit found FOUR more unpartitioned windows the
  // source-level greps missed: `Window.partitionBy(lit(1))` LOOKS
  // partitioned but Catalyst folds the literal key out of the spec,
  // leaving an unpartitioned WindowExec at execution (x96's global
  // median additionally partitioned by a lit-valued COLUMN — same
  // fold). All six sites now run through the window-free helpers;
  // these pins hold the executed plans there.
  for (q <- Seq("x95_hybrid_rrf", "x96_dsir_weights", "x122_benford",
      "x123_changepoint", "x126_gate_attrition", "x131_psi"))
    test(s"$q: no unpartitioned window survives constant folding") {
      val p = plan(q)
      assert(unpartitionedWindows(p).isEmpty, p)
    }
}
