package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Scale

/** Round-16: the BOUNDED siblings of the window-free helpers
  * (`Scale.denseIdsBounded` / `Scale.exclusiveRunningSumBounded`) —
  * one TakeOrdered action + a driver scan for frames bounded by
  * construction, where the distributed helpers' three-job shape cost
  * x95 3.5× and x123 3.6× on the bench. Pins: equivalence with the
  * distributed forms (hence with the global window they all replace),
  * the loud cap, the loud NULL value, and LocalRelation re-entry
  * (size stats known ⇒ broadcastable without hints).
  */
class BoundedHelpersSpec extends SparkSpec {

  import spark.implicits._

  test("denseIdsBounded matches global row_number on a unique key") {
    val df = spark.range(0, 500).select(
      (col("id") * 7919 % 500).as("k"),
      concat(lit("v"), col("id")).as("v"))
    val got = Scale.denseIdsBounded(df, Seq(col("k")), "id")
    val want = df.withColumn("id",
      row_number().over(Window.orderBy(col("k"))).cast("long"))
    assert(got.select("k", "v", "id").except(want.select("k", "v", "id"))
      .isEmpty && want.select("k", "v", "id")
      .except(got.select("k", "v", "id")).isEmpty)
  }

  test("denseIdsBounded: dense unique ids under sort-key ties") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3), ("b", 4), ("c", 5))
      .toDF("k", "v")
    val ids = Scale.denseIdsBounded(df, Seq(col("k")), "id")
      .select("id").as[Long].collect().sorted
    assert(ids.toSeq == (1L to 5L))
  }

  test("denseIdsBounded: empty frame yields empty with the id column") {
    val out = Scale.denseIdsBounded(
      Seq.empty[(String, Int)].toDF("k", "v"), Seq(col("k")), "id")
    assert(out.columns.toSeq == Seq("k", "v", "id") && out.count() == 0)
  }

  test("denseIdsBounded fails loudly past the cap") {
    val df = spark.range(0, 100).toDF("k")
    val e = intercept[IllegalStateException] {
      Scale.denseIdsBounded(df, Seq(col("k")), "id", cap = 99)
    }
    assert(e.getMessage.contains("cap=99") &&
      e.getMessage.contains("denseIds"))
  }

  test("denseIdsBounded agrees with the distributed denseIds") {
    val df = spark.range(0, 300).select(
      (col("id") * 31 % 300).as("k"), col("id").as("v"))
    val a = Scale.denseIdsBounded(df, Seq(col("k")), "id")
      .orderBy("id").collect().toSeq
    val b = Scale.denseIds(df, Seq(col("k")), "id", partitions = 4)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("denseIdsBounded result is a LocalRelation (broadcastable, no hint)") {
    val df = Seq(("a", 1L)).toDF("k", "v")
    val out = Scale.denseIdsBounded(df, Seq(col("k")), "id")
    assert(out.queryExecution.optimizedPlan.toString.contains("LocalRelation"),
      out.queryExecution.optimizedPlan.toString)
  }

  test("exclusiveRunningSumBounded matches the window form") {
    val df = spark.range(0, 200).select(
      (col("id") * 13 % 200).as("k"), (col("id") % 7 + 1).as("n"))
    val got = Scale.exclusiveRunningSumBounded(
      df, Seq(col("k")), col("n"), "excl")
    val want = df.withColumn("excl", coalesce(sum(col("n")).over(
      Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L)))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("exclusiveRunningSumBounded agrees with the distributed form") {
    val df = spark.range(0, 150).select(
      col("id").as("k"), (col("id") % 5).as("n"))
    val a = Scale.exclusiveRunningSumBounded(
      df, Seq(col("k")), col("n"), "excl").orderBy("k").collect().toSeq
    val b = Scale.exclusiveRunningSum(
      df, Seq(col("k")), col("n"), "excl", partitions = 4)
      .orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("exclusiveRunningSumBounded fails loudly on NULL values") {
    val df = Seq(("a", Some(1L)), ("b", None), ("c", Some(2L)))
      .toDF("k", "n")
    val e = intercept[Exception] {
      Scale.exclusiveRunningSumBounded(df, Seq(col("k")), col("n"), "excl")
    }
    assert(e.getMessage.contains("NULL value"))
  }

  test("exclusiveRunningSumBounded fails loudly past the cap") {
    val df = spark.range(0, 10).select(col("id").as("k"), lit(1L).as("n"))
    val e = intercept[IllegalStateException] {
      Scale.exclusiveRunningSumBounded(df, Seq(col("k")), col("n"), "x",
        cap = 9)
    }
    assert(e.getMessage.contains("cap=9"))
  }
}
