package graft

import org.apache.spark.sql.functions._

import graft.functions.Num.{roundz, zNorm}

/** The signed-zero rule (DESIGN.md §5, x119 postmortem): every rounded
  * double output must hash bit-stably, so `-0.0` — which `round()`
  * preserves and bit-hashing comparators distinguish from `+0.0` —
  * must never escape a query. */
class NumSpec extends SparkSpec {
  import spark.implicits._

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  test("roundz never emits -0.0 for any near-zero input") {
    // Spark's Round for doubles rides through BigDecimal, which has no
    // signed zero — so SPARK already lands on +0.0. DuckDB's round
    // PRESERVES the sign (verified: round(-1e-13, 3) = -0.0 there) —
    // that asymmetry was the x119 hash fail. roundz pins the engine
    // side of the contract; the matching `+ 0.0` in every oracle pins
    // DuckDB's. This test is the tripwire if a future Spark stops
    // normalizing.
    val df = Seq(-1e-13, 1e-13, -0.0, 0.0).toDF("x")
    val normed = df.select(roundz(col("x"), 3).as("r")).as[Double].collect()
    normed.foreach(v => assert(bits(v) == bits(0.0),
      s"roundz leaked a signed zero: bits=${bits(v).toHexString}"))
  }

  test("roundz is the identity (bit-exact) for non-zero values") {
    val vals = Seq(1.2345678, -9.87654321, 1e-3, -1e-3, 123456.789,
      -0.0005, Double.MaxValue, java.lang.Double.MIN_NORMAL)
    val df = vals.toDF("x")
    val a = df.select(round(col("x"), 3).as("r")).as[Double].collect()
    val b = df.select(roundz(col("x"), 3).as("r")).as[Double].collect()
    a.zip(b).foreach { case (p, q) =>
      assert(bits(p) == bits(q), s"roundz changed $p -> $q")
    }
  }

  test("roundz and zNorm ride nulls through") {
    val df = Seq[Option[Double]](Some(1.5), None).toDF("x")
    val out = df.select(roundz(col("x"), 2).as("r"), zNorm(col("x")).as("z"))
      .collect()
    assert(out.count(r => r.isNullAt(0) && r.isNullAt(1)) == 1)
    assert(out.count(r => !r.isNullAt(0)) == 1)
  }

  test("zNorm normalizes a bare -0.0 column") {
    val df = Seq(-0.0).toDF("x")
    val v = df.select(zNorm(col("x")).as("z")).as[Double].head()
    assert(bits(v) == bits(0.0))
  }
}
