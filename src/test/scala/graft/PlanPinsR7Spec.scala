package graft

import org.apache.spark.sql.functions._

/** Physical-plan pins for the round-7 fixes. */
class PlanPinsR7Spec extends SparkSpec {

  private def shuffles(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  // The forward as-of used to carry with first(ignoreNulls) over
  // currentRow..unboundedFollowing — Spark rescans that frame from
  // each row to partition end, quadratic in rows-per-key. Both
  // directions must stay on the O(n) running frame.
  test("as-of carries use the running frame in both directions") {
    val l = spark.range(1000).select(col("id"),
      (col("id") % 50).as("k"), (col("id") % 97).as("ts"))
    val r = spark.range(800).select((col("id") + 5000).as("rid"),
      (col("id") % 50).as("k"), (col("id") % 89).as("ts"))
    for (forward <- Seq(false, true)) {
      val df =
        if (forward)
          graft.operators.AsOfJoin.firstAfter(l, r, Seq("k"),
            col("ts"), col("ts"), Seq(col("rid").as("mid")), Seq(col("rid")))
        else
          graft.operators.AsOfJoin.lastPrior(l, r, Seq("k"),
            col("ts"), col("ts"), Seq(col("rid").as("mid")), Seq(col("rid")))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("unboundedfollowing"),
        s"forward=$forward has a quadratic frame:\n$plan")
      assert(shuffles(plan) === 1, s"forward=$forward:\n$plan")
    }
  }

  test("pointInTime stays a single-shuffle running-frame carry") {
    val facts = spark.range(1000).select(col("id"),
      (col("id") % 50).as("k"), (col("id") % 97).as("ts"))
    val dim = spark.range(200).select((col("id") % 50).as("k"),
      (col("id") % 4).as("version"), (col("id") % 80).as("f"),
      (col("id") % 80 + 10).as("t"), col("id").as("payload"))
    val df = graft.operators.AsOfJoin.pointInTime(facts, dim, Seq("k"),
      col("ts"), col("f"), col("t"),
      dimCols = Seq(col("payload")), dimTieBreak = Seq(col("version")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("unboundedfollowing"), plan)
    assert(shuffles(plan) === 1, plan)
  }
}
