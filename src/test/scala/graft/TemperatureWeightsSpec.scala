package graft

import org.apache.spark.sql.functions._

import graft.ext.Sampling

class TemperatureWeightsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("a", 100L), ("a", 300L),   // mass 400
    ("b", 50L),                 // mass 50
    ("c", 25L), ("c", 25L))     // mass 50

  test("matches the hand computation; alpha=1 is natural proportion") {
    val df = rows.toDF("d", "m")
    val got = Sampling.temperatureWeights(df, col("d"), col("m"), 0.5)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val wA = math.pow(400.0, 0.5); val wB = math.pow(50.0, 0.5)
    val tot = wA + 2 * wB
    assert(got("a")._2 === 2L && got("a")._3 === 400L)
    assert(math.abs(got("a")._4 - wA) < 1e-12)
    assert(math.abs(got("a")._5 - wA / tot) < 1e-12)
    assert(math.abs(got("b")._5 - wB / tot) < 1e-12)
    // rates always sum to 1
    assert(math.abs(got.values.map(_._5).sum - 1.0) < 1e-12)
    val nat = Sampling.temperatureWeights(df, col("d"), col("m"), 1.0)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(math.abs(nat("a") - 0.8) < 1e-12)
    assert(math.abs(nat("b") - 0.1) < 1e-12)
  }

  test("lower alpha flattens the mixture toward uniform") {
    val df = rows.toDF("d", "m")
    def rateA(alpha: Double): Double =
      Sampling.temperatureWeights(df, col("d"), col("m"), alpha)
        .filter(col("group") === "a")
        .select("rate").as[Double].collect().head
    assert(rateA(1.0) > rateA(0.5) && rateA(0.5) > rateA(0.2))
    assert(rateA(0.2) > 1.0 / 3) // still above uniform for the big domain
  }

  test("invalid alpha rejected") {
    intercept[IllegalArgumentException] {
      Sampling.temperatureWeights(rows.toDF("d", "m"), col("d"), col("m"), 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureWeights(rows.toDF("d", "m"), col("d"), col("m"), 1.5)
    }
  }
}
