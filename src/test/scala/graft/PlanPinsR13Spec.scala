package graft

/** Physical-plan pins for the round-13 gates: the multimedia and
  * radius-7 surfaces must never cartesian or sort-merge the corpus,
  * and the widened decode scans must actually carry their explicit
  * exchange (the AQE-coalesce gotcha would silently fold a
  * number-less repartition back to one task). */
class PlanPinsR13Spec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("x146 radius-7: multi-probe joins broadcast/hash only, never cartesian or sort-merge") {
    val p = plan("x146_radius7_near_dup")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Cartesian"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
  }

  test("x149 governed radius-7: same join discipline with the cap firing") {
    val p = plan("x149_radius7_capped")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Cartesian"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
  }

  test("x144/x147 cross-format screens: same join discipline") {
    for (q <- Seq("x144_webp_cross_dedup", "x147_audio_resample_dedup")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"), s"$q: $p")
      assert(!p.contains("Cartesian"), s"$q: $p")
    }
  }

  test("x148 six-modality dispatch: decode runs behind an explicit-count exchange") {
    val p = plan("x148_media_dispatch6")
    // the RoundRobin/hash repartition with an explicit numPartitions
    // survives AQE; its absence means the synth+decode collapsed back
    // onto the 1-2 parquet splits
    assert(p.contains("Exchange hashpartitioning(doc_id"), p)
  }

  test("x145 store read-back: the final select is a snapshot scan, not a recompute") {
    // survivors() resolves the newest commit marker, reads ONE parquet
    // snapshot, and (round 14) eagerly localCheckpoints the
    // survivor-set-sized result so the temp store can be deleted: the
    // returned frame's plan must be a plain materialized-snapshot scan
    // with no joins — any curation recompute leaking into the final
    // plan would surface as join/aggregate nodes here
    val p = plan("x145_curation_store")
    assert(!p.contains("Join"), p)
    assert(p.contains("Scan ExistingRDD"), p)
  }
}
