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

  test("moment partials merge to exactly the direct whole-table profile") {
    val df = Seq(
      ("a", Some(4L)), ("a", Some(6L)), ("a", None),
      ("b", Some(10L)), ("b", Some(2L)), ("c", Some(7L)))
      .toDF("s", "v")
    val partials = graft.operators.Profile.momentPartials(
      df, org.apache.spark.sql.functions.col("s"),
      org.apache.spark.sql.functions.col("v"))
    val merged = graft.operators.Profile.momentsFinalize(
      graft.operators.Profile.momentsCombine(partials))
      .as[(String, Long, Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    // direct: values 4,6,10,2,7 -> n=6, nulls=1, s1=29, min=2, max=10
    assert(merged._2 === 6L && merged._3 === 1L && merged._4 === 29L)
    assert(merged._5 === 2L && merged._6 === 10L)
    val mean = 29.0 / 5
    val varP = (16.0 + 36 + 100 + 4 + 49) / 5 - mean * mean
    assert(merged._7.get === mean)   // bit-exact, not approx
    assert(merged._8.get === varP)
    // merge order can't matter: combine in two stages
    val half1 = graft.operators.Profile.momentsCombine(
      partials.filter($"slice" === "a"))
    val half2 = graft.operators.Profile.momentsCombine(
      partials.filter($"slice" =!= "a"))
    val twoStage = graft.operators.Profile.momentsFinalize(
      graft.operators.Profile.momentsCombine(half1.unionByName(half2)))
      .as[(String, Long, Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(twoStage === merged)
  }

  test("hll distinct partials union to the direct whole-table sketch") {
    val df = (1L to 2000L).map(i => (s"s${i % 4}", i % 700))
      .toDF("s", "v")
    val partials = graft.operators.Profile.distinctPartials(
      df, org.apache.spark.sql.functions.col("s"),
      org.apache.spark.sql.functions.col("v"))
    assert(partials.count() === 4)
    val merged = graft.operators.Profile.distinctCombine(partials)
      .select("n_rows", "distinct_est").as[(Long, Long)].collect().head
    assert(merged._1 === 2000L)
    // a union of per-slice sketches is NOT byte-identical to one
    // direct sketch (HLL_4 sparse->dense promotion depends on the
    // update/merge path), but both estimates carry the same error
    // guarantee — assert proximity to each other and to the truth
    val direct = graft.operators.Profile.distinctPartials(
      df.withColumn("g", org.apache.spark.sql.functions.lit("all")),
      org.apache.spark.sql.functions.col("g"),
      org.apache.spark.sql.functions.col("v"))
      .select("distinct_est").as[Long].collect().head
    assert(math.abs(merged._2 - direct) <= 0.05 * 700,
      s"merged ${merged._2} vs direct $direct")
    // both land near the true 700 (HLL_4 lgK=12 ~1.6% rse)
    assert(math.abs(merged._2 - 700L) <= 35, s"est ${merged._2}")
    assert(math.abs(direct - 700L) <= 35, s"direct $direct")
  }

  test("all-null slice finalizes to null mean/variance") {
    val df = Seq(("a", None: Option[Long])).toDF("s", "v")
    val got = graft.operators.Profile.momentsFinalize(
      graft.operators.Profile.momentPartials(
        df, org.apache.spark.sql.functions.col("s"),
        org.apache.spark.sql.functions.col("v")))
      .as[(String, Long, Long, Long, Option[Long], Option[Long],
        Option[Double], Option[Double])].collect().head
    assert(got._7.isEmpty && got._8.isEmpty)
  }
}
