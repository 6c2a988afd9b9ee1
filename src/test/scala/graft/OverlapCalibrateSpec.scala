package graft

import org.apache.spark.sql.functions._

import graft.ext.Overlap
import graft.operators.Calibrate

/** Specs for corpus-overlap governance and percentile calibration. */
class OverlapCalibrateSpec extends SparkSpec {
  import spark.implicits._

  test("overlap matrix counts shared fingerprints and jaccard") {
    // A: {t1, t2, t3}; B: {t2, t3, t4}; C: {t5} (disjoint — no row)
    val docs = Seq(
      ("A", "t one"), ("A", "t two"), ("A", "t three"),
      ("B", "t two"), ("B", "t three"), ("B", "t four"),
      ("C", "t five")).toDF("src", "text")
    val got = Overlap.sourceOverlap(docs, "text", "src")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(("A", "B", 2L, 3L, 3L, 2.0 / 4.0)))
  }

  test("overlap dedups within source before counting") {
    // the same text twice in A must count once
    val docs = Seq(("A", "dup"), ("A", "dup"), ("B", "dup"))
      .toDF("src", "text")
    val got = Overlap.sourceOverlap(docs, "text", "src")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(("A", "B", 1L, 1L, 1L, 1.0)))
  }

  test("overlap normalizes text like exact dedup (case/punct)") {
    val docs = Seq(("A", "Hello, World!"), ("B", "hello world"))
      .toDF("src", "text")
    assert(Overlap.sourceOverlap(docs, "text", "src").count() === 1L)
  }

  test("percentRank matches SQL percent_rank semantics incl. ties") {
    // group g: values 10, 20, 20, 30 -> pct 0, 1/3, 1/3, 1
    // group h: single row -> 0
    val df = Seq(("g", 10), ("g", 20), ("g", 20), ("g", 30), ("h", 5))
      .toDF("grp", "v")
    val got = Calibrate.percentRank(df, col("grp"), col("v"))
      .select("grp", "v", "pct").as[(String, Int, Double)]
      .collect().toSet
    assert(got === Set(("g", 10, 0.0), ("g", 20, 1.0 / 3.0),
      ("g", 30, 1.0), ("h", 5, 0.0)))
  }

  test("percentRank never windows raw rows (no corpus-sized sort task)") {
    val df = spark.range(10000).select((col("id") % 3).as("grp"),
      (col("id") % 100).as("v"))
    val plan = Calibrate.percentRank(df, col("grp"), col("v"))
      .queryExecution.optimizedPlan.toString
    // the window's child must be the (group, value) aggregate, never
    // the raw scan: only Aggregate appears below Window in the plan
    val windowIdx = plan.indexOf("Window")
    assert(windowIdx >= 0, plan)
    assert(plan.indexOf("Aggregate", windowIdx) >= 0, plan)
    // and results agree with the naive percent_rank window
    val naive = df.withColumn("pct",
      percent_rank().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("grp")).orderBy(col("v"))))
      .groupBy("grp", "v").agg(first("pct").as("pct"))
      .as[(Long, Long, Double)].collect().toSet
    val ours = Calibrate.percentRank(df, col("grp"), col("v"))
      .groupBy("grp", "v").agg(first("pct").as("pct"))
      .as[(Long, Long, Double)].collect().toSet
    assert(ours === naive)
  }

  test("percentRank is deterministic across partition layouts") {
    val df = spark.range(500).select((col("id") % 7).as("grp"),
      (col("id") % 13).as("v"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Calibrate.percentRank(d, col("grp"), col("v"))
        .as[(Long, Long, Double)].collect().toSet
    assert(run(df) === run(df.repartition(11)))
  }

  test("reliability bins, clamps, and computes per-bin gaps exactly") {
    val df = Seq(
      (0.04, false), (-0.5, false), // clamp → both bin 0, no positives
      (0.95, true), (0.95, false), (1.0, true) // top edge closes → bin 9
    ).toDF("score", "label")
    val got = Calibrate.reliability(df, col("score"), col("label"), 10)
      .select("bin", "n", "n_pos", "conf_mid", "acc")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (0L, 2L, 0L, 0.05, 0.0),
      (9L, 3L, 2L, 0.95, 2.0 / 3.0)))
  }

  test("reliability skips null scores and rejects bad bin counts") {
    val df = Seq((Some(0.5), true), (None, true)).toDF("score", "label")
    val got = Calibrate.reliability(df, col("score"), col("label"), 4)
      .select("bin", "n").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((2L, 1L)))
    intercept[IllegalArgumentException] {
      Calibrate.reliability(df, col("score"), col("label"), 0)
    }
  }
  test("percentRank keeps NULL group and NULL value rows (null-safe join back)") {
    import spark.implicits._
    import graft.operators.Calibrate
    val df = Seq((Some("g"), Some(1.0)), (Some("g"), Some(2.0)),
      (Some("g"), None), (None, Some(5.0)))
      .toDF("g", "v")
    val got = Calibrate.percentRank(df, col("g"), col("v"))
    assert(got.count() === 4L, "no row may vanish at the join back")
    // NULLs sort first: the null-value row ranks 0 within group g
    val nullV = got.filter(col("g") === "g" && col("v").isNull)
      .select("pct").as[Double].collect()
    assert(nullV.toSeq === Seq(0.0))
    // single-row null group gets 0 by the n==1 rule
    val nullG = got.filter(col("g").isNull).select("pct")
      .as[Double].collect()
    assert(nullG.toSeq === Seq(0.0))
  }
}
