package graft

import org.apache.spark.sql.functions._

import graft.ext.Embeddings

/** Specs for DataFrame-level embedding pooling (the per-vector kernels
  * are covered by `VectorFunctionsSpec`). */
class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

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

  test("per-vector kernels stay shuffle-free") {
    import graft.functions.{VectorFunctions => V}
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    val plan = df.select(V.normalize(col("v")), V.quantizeInt8(col("v")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
