package graft

import org.apache.spark.sql.functions._

import graft.operators.Decay

/** Specs for exponential recency-decay scoring. */
class DecaySpec extends SparkSpec {
  import spark.implicits._

  test("weights decay by e per tau; newest event contributes 1") {
    val df = Seq((1L, 100.0), (1L, 90.0), (2L, 100.0))
      .toDF("user_id", "ts")
    val got = Decay.recencyScore(df, "user_id", "ts", tau = 10.0)
      .orderBy("user_id").as[(Long, Long, Double)].collect().toSeq
    assert(got.map(g => (g._1, g._2)) === Seq((1L, 2L), (2L, 1L)))
    assert(math.abs(got(0)._3 - (1.0 + math.exp(-1.0))) < 1e-12)
    assert(math.abs(got(1)._3 - 1.0) < 1e-12)
  }

  test("explicit reference time shifts every weight") {
    val df = Seq((1L, 100.0)).toDF("user_id", "ts")
    val got = Decay.recencyScore(df, "user_id", "ts", tau = 10.0,
      refTime = Some(lit(110.0))).as[(Long, Long, Double)].head()
    assert(math.abs(got._3 - math.exp(-1.0)) < 1e-12)
  }

  test("invalid tau rejected") {
    intercept[IllegalArgumentException] {
      Decay.recencyScore(Seq((1L, 1.0)).toDF("u", "ts"), "u", "ts", 0.0) }
  }
}
