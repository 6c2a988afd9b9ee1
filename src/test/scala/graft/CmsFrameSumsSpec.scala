package graft

import org.apache.spark.sql.functions._

import graft.ext.Mp4Demux
import graft.operators.Profile

/** Round-8: count-min sketch monoid properties and per-frame sum
  * extraction (the scene-change input series).
  */
class CmsFrameSumsSpec extends SparkSpec {
  import spark.implicits._

  // ---- count-min sketch -----------------------------------------------

  // keys with known frequencies: 0 ×10, 1 ×5, 7 ×3, 42 ×1
  private def keyRows = (Seq.fill(10)(0L) ++ Seq.fill(5)(1L) ++
    Seq.fill(3)(7L) ++ Seq(42L)).zipWithIndex
    .map { case (k, i) => (k, if (i % 2 == 0) "a" else "b") }

  test("cms estimates are never below the true counts") {
    val df = keyRows.toDF("k", "slice")
    val sketch = Profile.cmsCombine(
      Profile.cmsPartials(df, col("slice"), col("k")))
    val probes = Seq(0L, 1L, 7L, 42L, 999L).toDF("k")
    val est = Profile.cmsEstimate(sketch, probes, "k")
      .as[(Long, Long)].collect().toMap
    val truth = Map(0L -> 10L, 1L -> 5L, 7L -> 3L, 42L -> 1L, 999L -> 0L)
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"key $k: est ${est(k)} < true $t")
    }
    // width 64 >> 4 distinct keys: no collisions, estimates exact
    assert(est === truth)
  }

  test("cms merge of slice partials equals the one-shot sketch") {
    val df = keyRows.toDF("k", "slice")
    val merged = Profile.cmsCombine(
      Profile.cmsPartials(df, col("slice"), col("k")))
      .select("row_i", "bucket", "cnt")
      .as[(Int, Long, Long)].collect().toSet
    val oneShot = Profile.cmsCombine(
      Profile.cmsPartials(df, lit("all"), col("k")))
      .select("row_i", "bucket", "cnt")
      .as[(Int, Long, Long)].collect().toSet
    assert(merged === oneShot)
  }

  test("cms sketch is independent of partitioning") {
    val df = keyRows.toDF("k", "slice")
    val a = Profile.cmsCombine(Profile.cmsPartials(
      df.repartition(13), col("slice"), col("k")))
      .collect().map(_.toSeq).toSet
    val b = Profile.cmsCombine(Profile.cmsPartials(
      df.coalesce(1), col("slice"), col("k")))
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("cms forced collisions overcount, never undercount") {
    // width 2: everything collides; estimates are bucket sums
    val df = (0L until 20L).map(k => (k, "s")).toDF("k", "slice")
    val sketch = Profile.cmsCombine(
      Profile.cmsPartials(df, col("slice"), col("k"), depth = 2,
        width = 2))
    val est = Profile.cmsEstimate(sketch, (0L until 20L).toDF("k"), "k",
      depth = 2, width = 2)
      .as[(Long, Long)].collect()
    assert(est.forall(_._2 >= 1L))
    assert(est.map(_._2).sum > 20L) // collisions must show somewhere
  }

  test("cms estimate with mismatched dimensions fails loudly") {
    val df = keyRows.toDF("k", "slice")
    val small = Profile.cmsCombine(
      Profile.cmsPartials(df, col("slice"), col("k"), depth = 2,
        width = 2))
    // estimating a depth-2 sketch with the depth-4 default would
    // min() over never-filled rows and return 0 — UNDER the truth;
    // the metadata the frame carries catches it exactly
    val e = intercept[IllegalArgumentException] {
      Profile.cmsEstimate(small, Seq(0L).toDF("k"), "k").collect()
    }
    assert(e.getMessage.contains("was built with"))
    val e2 = intercept[IllegalArgumentException] {
      Profile.cmsEstimate(small, Seq(0L).toDF("k"), "k", depth = 2,
        width = 1).collect()
    }
    assert(e2.getMessage.contains("was built with"))
    // width UNDERSHOOT (built 8, estimated 64): observationally
    // invisible (sparse wide == narrow), caught only via metadata —
    // the round-8 second-pass finding
    val narrow = Profile.cmsCombine(
      Profile.cmsPartials(df, col("slice"), col("k"), depth = 4,
        width = 8))
    val e3 = intercept[IllegalArgumentException] {
      Profile.cmsEstimate(narrow, Seq(0L).toDF("k"), "k", depth = 4,
        width = 64).collect()
    }
    assert(e3.getMessage.contains("was built with"))
    // a BARE frame (metadata stripped — the read-back-from-DB path)
    // still gets the observational depth check
    val bare = small.select("slice", "row_i", "bucket", "cnt")
    val e4 = intercept[IllegalArgumentException] {
      Profile.cmsEstimate(bare, Seq(0L).toDF("k"), "k").collect()
    }
    assert(e4.getMessage.contains("build parameters"))
  }

  // ---- mp4 frame sums -------------------------------------------------

  test("frameSums matches the synthetic pixel formula per frame") {
    val (w, h, nf, seed) = (5, 3, 4, 77)
    val sums = Seq(Mp4Demux.mp4FramesBytes(w, h, nf, seed)).toDF("b")
      .select(Mp4Demux.frameSums(col("b")).as("s"))
      .as[Seq[Long]].head()
    val expect = (0 until nf).map { f =>
      (0 until w).map(x => (seed + f * 31 + x) % 256).sum.toLong * h
    }
    assert(sums === expect)
  }

  test("frameSums is null on undecodable bytes") {
    val out = Seq(Array[Byte](1, 2, 3)).toDF("b")
      .select(Mp4Demux.frameSums(col("b")).as("s"))
      .collect().head
    assert(out.isNullAt(0))
  }
}
