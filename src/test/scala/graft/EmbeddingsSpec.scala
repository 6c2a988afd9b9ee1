package graft

import org.apache.spark.sql.functions._

import graft.ext.Embeddings

/** Specs for embedding-vector hygiene ops. */
class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("l2Normalize yields unit vectors; zero vector passes through") {
    val df = Seq((1L, Array(3.0f, 4.0f)), (2L, Array(0.0f, 0.0f)))
      .toDF("id", "v")
    val got = df.select(col("id"), Embeddings.l2Normalize(col("v")).as("n"))
      .orderBy("id").as[(Long, Seq[Double])].collect()
    assert(got(0)._2 === Seq(0.6, 0.8))
    assert(got(1)._2 === Seq(0.0, 0.0))
  }

  test("int8Quantize hits ±127 at the extremes and dequantizes back") {
    val df = Seq((1L, Array(0.5f, -1.0f, 0.25f, 0.0f))).toDF("id", "v")
    val got = df.select(Embeddings.int8Quantize(col("v")).as("s"))
      .select(col("s.q"), col("s.scale"))
      .as[(Seq[Int], Double)].head()
    assert(got._1 === Seq(64, -127, 32, 0)) // 0.5*127=63.5 rounds up
    assert(math.abs(got._2 - 1.0 / 127) < 1e-15)
    // dequantized error bounded by scale/2 per component
    got._1.zip(Seq(0.5, -1.0, 0.25, 0.0)).foreach { case (q, v) =>
      assert(math.abs(q * got._2 - v) <= got._2 / 2 + 1e-15) }
  }

  test("int8Quantize of the zero vector is zeros with scale 0") {
    val df = Seq((1L, Array(0.0f, 0.0f))).toDF("id", "v")
    val got = df.select(Embeddings.int8Quantize(col("v")).as("s"))
      .select(col("s.q"), col("s.scale")).as[(Seq[Int], Double)].head()
    assert(got === ((Seq(0, 0), 0.0)))
  }

  test("meanPool averages element-wise per group and counts members") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f)), (1L, Array(3.0f, 6.0f)),
      (2L, Array(5.0f, 5.0f))).toDF("label", "v")
    val got = Embeddings.meanPool(df, "label", "v")
      .orderBy("label").as[(Long, Seq[Double], Long)].collect()
    assert(got(0) === ((1L, Seq(2.0, 4.0), 2L)))
    assert(got(1) === ((2L, Seq(5.0, 5.0), 1L)))
  }

  test("meanPool keeps dimension order for wide vectors") {
    val dim = 40
    val df = Seq((1L, Array.tabulate(dim)(_.toFloat))).toDF("label", "v")
    val got = Embeddings.meanPool(df, "label", "v")
      .as[(Long, Seq[Double], Long)].head()
    assert(got._2 === Seq.tabulate(dim)(_.toDouble))
  }

  test("per-vector ops are shuffle-free") {
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    val plan = df.select(Embeddings.l2Normalize(col("v")),
        Embeddings.int8Quantize(col("v")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
