package graft

import org.apache.spark.sql.functions._

import graft.operators.Paths

/** Specs for sessionized event-path mining. */
class PathsSpec extends SparkSpec {
  import spark.implicits._

  test("paths fold each session's events in (ts, tie) order") {
    // user 1: [a@1, c@2, b@3] then gap -> [a@100]; user 2: [b@5]
    val events = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "c"), (1L, 3L, 3L, "b"),
      (1L, 100L, 4L, "a"), (2L, 5L, 5L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Paths.sessionPaths(events, "user_id", "ts", "event_type",
      "event_id", gap = 10L)
      .select("user_id", "session_id", "n_events", "path")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === Set((1L, 1L, 3L, "a>c>b"), (1L, 2L, 1L, "a"),
      (2L, 1L, 1L, "b")))
  }

  test("equal timestamps order by the tie-break column") {
    val events = Seq((1L, 10L, 2L, "y"), (1L, 10L, 1L, "x"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Paths.sessionPaths(events, "user_id", "ts", "event_type",
      "event_id", gap = 10L).select("path").as[String].collect()
    assert(got.toSeq === Seq("x>y"))
  }

  test("topPaths ranks by (count desc, path) deterministically") {
    val paths = Seq("a>b", "a>b", "c", "b", "c").toDF("path")
      .withColumn("user_id", lit(1L))
    val got = Paths.topPaths(paths, k = 2)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("a>b", 2L), ("c", 2L)))
  }

  test("deterministic across partition layouts") {
    val events = (1L to 500L).map(i =>
      (i % 7, i, i, s"e${i % 3}")).toDF("user_id", "ts", "event_id", "event_type")
    def run(d: org.apache.spark.sql.DataFrame) =
      Paths.sessionPaths(d, "user_id", "ts", "event_type", "event_id",
        gap = 5L).as[(Long, Long, Long, String)].collect().toSet
    assert(run(events) === run(events.repartition(13)))
  }

  test("invalid args rejected") {
    val df = Seq((1L, 1L, 1L, "a")).toDF("user_id", "ts", "event_id", "event_type")
    intercept[IllegalArgumentException] {
      Paths.sessionPaths(df, "user_id", "ts", "event_type", "event_id", 0L) }
    intercept[IllegalArgumentException] {
      Paths.topPaths(df.withColumn("path", lit("a")), 0) }
  }
}
