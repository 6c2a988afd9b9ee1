package graft

import graft.operators.Profile

/** Snapshot-drift semantics: added/removed/common status, count and
  * null-count deltas, NULL cents on a missing side. */
class ProfileDriftSpec extends SparkSpec {
  import spark.implicits._

  private val a = Seq(
    ("x", Some(1.0)), ("x", None), ("y", Some(2.0)))
    .toDF("k", "v")
  private val b = Seq(
    ("x", Some(1.5)), ("z", Some(3.0)), ("z", Some(4.0)))
    .toDF("k", "v")

  test("drift report covers added, removed, and common keys") {
    val got = Profile.snapshotDrift(a, b, "k", "v")
      .orderBy("key")
      .as[(String, String, Long, Long, Long, Long, Long,
        Option[Long], Option[Long])]
      .collect().toSeq
    assert(got === Seq(
      ("x", "common", 2L, 1L, -1L, 1L, 0L, Some(100L), Some(150L)),
      ("y", "removed", 1L, 0L, -1L, 0L, 0L, Some(200L), None),
      ("z", "added", 0L, 2L, 2L, 0L, 0L, None, Some(700L))))
  }

  test("identical snapshots show zero drift everywhere") {
    val got = Profile.snapshotDrift(a, a, "k", "v")
      .select("status", "delta_n")
      .as[(String, Long)].collect().toSeq
    assert(got.forall(r => r._1 == "common" && r._2 == 0L))
  }
}
