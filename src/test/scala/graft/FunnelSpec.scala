package graft

import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** Specs for ordered funnel analysis. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    // user 1 completes view(10) -> click(20) -> buy(30)
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
    // user 2 clicks BEFORE viewing: click must not count
    (2L, 5L, "click"), (2L, 10L, "view"),
    // user 3 views only
    (3L, 7L, "view"),
    // user 4 never views (absent from output)
    (4L, 1L, "click"), (4L, 2L, "buy"),
    // user 5: click at the SAME ts as view -> strict order rejects it,
    // but a later click then a buy completes the funnel
    (5L, 10L, "view"), (5L, 10L, "click"), (5L, 15L, "click"),
    (5L, 16L, "buy")).toDF("user_id", "ts", "event_type")

  private def run() = Funnel.stages(events, "user_id", "ts",
      "event_type", Seq("view", "click", "buy"))
    .orderBy("user_id")
    .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
    .collect().toSeq

  test("stage timestamps honor strict ordering") {
    val got = run()
    assert(got.map(_._1) === Seq(1L, 2L, 3L, 5L))
    assert(got(0) === ((1L, 3L, Some(10L), Some(20L), Some(30L))))
    assert(got(1) === ((2L, 1L, Some(10L), None, None)))
    assert(got(2) === ((3L, 1L, Some(7L), None, None)))
    assert(got(3) === ((5L, 3L, Some(10L), Some(15L), Some(16L))))
  }

  test("earliest qualifying event wins each stage") {
    val e = Seq((1L, 1L, "a"), (1L, 5L, "b"), (1L, 3L, "b"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.stages(e, "user_id", "ts", "event_type",
      Seq("a", "b")).as[(Long, Long, Long, Long)].head()
    assert(got === ((1L, 2L, 1L, 3L)))
  }

  test("single-stage funnel is first-event-per-user") {
    val got = Funnel.stages(events, "user_id", "ts", "event_type",
      Seq("click")).orderBy("user_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 20L), (2L, 1L, 5L), (4L, 1L, 1L),
      (5L, 1L, 10L)))
  }

  test("invalid stage lists rejected") {
    intercept[IllegalArgumentException] {
      Funnel.stages(events, "user_id", "ts", "event_type", Nil) }
    intercept[IllegalArgumentException] {
      Funnel.stages(events, "user_id", "ts", "event_type",
        Seq("a", "a")) }
  }

  test("plan: stage joins reuse the user-key partitioning") {
    val big = spark.range(2000).select((col("id") % 100).as("user_id"),
      col("id").as("ts"),
      element_at(array(lit("view"), lit("click"), lit("buy")),
        (col("id") % 3 + 1).cast("int")).as("event_type"))
    val plan = Funnel.stages(big, "user_id", "ts", "event_type",
      Seq("view", "click", "buy"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // final+initial plan text double-counts under AQE; the real plan
    // needs only the per-slice scans' exchanges, never one per stage
    assert(!plan.contains("CartesianProduct"), plan)
    assert(exchanges <= 8, s"too many exchanges ($exchanges):\n$plan")
  }
}
