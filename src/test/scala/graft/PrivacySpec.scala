package graft

import org.apache.spark.sql.functions._

import graft.ext.Privacy

/** Deterministic-Laplace DP counts: reproducibility, seed/epsilon
  * behavior, and exact-count integrity. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val df = (1L to 1000L).map(i => (i, s"g${i % 7}"))
    .toDF("id", "g")

  test("same seed reproduces the identical noisy release") {
    val a = Privacy.noisyCounts(df, col("g"), epsilon = 1.0, seed = "s")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    val b = Privacy.noisyCounts(df, col("g"), epsilon = 1.0, seed = "s")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.map(_._2).sum === 1000L)
  }

  test("different seeds draw different noise; counts stay exact") {
    val a = Privacy.noisyCounts(df, col("g"), epsilon = 1.0, seed = "s1")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    val b = Privacy.noisyCounts(df, col("g"), epsilon = 1.0, seed = "s2")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(a.map(_._2).toSeq === b.map(_._2).toSeq, "exact counts equal")
    assert(a.map(_._3).toSeq !== b.map(_._3).toSeq, "noise differs")
  }

  test("noise scales exactly with 1/epsilon") {
    val e1 = Privacy.noisyCounts(df, col("g"), epsilon = 1.0, seed = "s")
      .select(col("grp"), (col("noisy") - col("n")).as("noise"))
      .as[(String, Double)].collect().sortBy(_._1)
    val e2 = Privacy.noisyCounts(df, col("g"), epsilon = 0.5, seed = "s")
      .select(col("grp"), (col("noisy") - col("n")).as("noise"))
      .as[(String, Double)].collect().sortBy(_._1)
    // noise is recovered as (n + noise) - n, which costs a few low
    // bits — the 2x relation is exact in the mechanism, approx here
    e1.zip(e2).foreach { case ((_, n1), (_, n2)) =>
      assert(math.abs(n2 - 2.0 * n1) < 1e-12,
        s"b doubles when epsilon halves: $n2 vs ${2.0 * n1}")
    }
    assert(e1.exists(r => math.abs(r._2) > 1e-3), "noise is non-trivial")
  }

  test("invalid parameters are rejected") {
    intercept[IllegalArgumentException] {
      Privacy.noisyCounts(df, col("g"), epsilon = 0.0)
    }
    intercept[IllegalArgumentException] {
      Privacy.noisyCounts(df, col("g"), epsilon = 1.0, sensitivity = 0.0)
    }
  }
}
