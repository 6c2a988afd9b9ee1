package graft

import org.apache.spark.sql.functions._

import graft.operators.Pipeline

/** Hand-computed funnel fixtures for Pipeline.gateAttrition. */
class GateAttritionSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, 10, 5.0),  // passes all
    (2L, 2, 5.0),   // fails stage 0 (n too small)
    (3L, 10, 99.0), // fails stage 1 (m too big)
    (4L, 1, 99.0),  // fails stage 0 FIRST (attribution order)
    (5L, 10, 5.0)   // passes all
  ).toDF("id", "n", "m")

  private val stages = Seq(
    "n_window" -> col("n").between(5, 200),
    "m_cap" -> (col("m") <= 10.0))

  test("gateAttrition attributes rows to their FIRST failing stage") {
    val out = Pipeline.gateAttrition(df, stages)
      .select("stage_idx", "stage", "n_in", "n_failed", "n_out")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (0L, "n_window", 5L, 2L, 3L),
      (1L, "m_cap", 3L, 1L, 2L)))
  }

  test("gateAttrition drop rate is failed/entering, zero-safe") {
    val rates = Pipeline.gateAttrition(df, stages)
      .select("stage_idx", "drop_rate_r").as[(Long, Double)]
      .collect().toMap
    assert(rates(0L) === 0.4)
    assert(rates(1L) === math.rint(1.0 / 3.0 * 1e9) / 1e9)
    // all rows die at stage 0: stage 1 sees n_in = 0, rate 0.0
    val empty = Pipeline.gateAttrition(
      Seq((1L, 1), (2L, 2)).toDF("id", "n"),
      Seq("kill" -> (col("n") > 99), "after" -> (col("n") > 0)))
    val r = empty.select("stage_idx", "n_in", "n_failed", "drop_rate_r")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(r.toSeq === Seq((0L, 2L, 2L, 1.0), (1L, 0L, 0L, 0.0)))
  }

  test("gateAttrition NULL predicate does not fail the row") {
    val d = Seq((1L, Some(10)), (2L, None)).toDF("id", "n")
    val out = Pipeline.gateAttrition(d,
      Seq("n_pos" -> (col("n") > 0)))
      .select("n_in", "n_failed", "n_out").as[(Long, Long, Long)]
      .head()
    // the NULL-n row falls through to the survivors bucket
    assert(out === ((2L, 0L, 2L)))
  }

  test("gateAttrition stage totals reconcile with the input") {
    val out = Pipeline.gateAttrition(df, stages).collect()
    val first = out.minBy(_.getLong(0))
    assert(first.getAs[Long]("n_in") === df.count())
    // chaining: each stage's n_out is the next stage's n_in
    val sorted = out.sortBy(_.getLong(0))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_out") === b.getAs[Long]("n_in"))
    }
  }
}
