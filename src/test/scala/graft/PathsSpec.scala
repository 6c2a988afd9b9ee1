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

  test("transitions count lag pairs per user; p conditions on prev") {
    // user 1: a->b->b ; user 2: a->b ; user 3: c (no pair)
    val events = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "b"),
      (2L, 1L, 4L, "a"), (2L, 2L, 5L, "b"), (3L, 9L, 6L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Paths.transitions(events, "user_id", "ts", "event_type",
        "event_id")
      .as[(String, String, Long, Double)].collect().toSet
    assert(got === Set(
      ("a", "b", 2L, 1.0),
      ("b", "b", 1L, 1.0)))
  }

  test("transitions never cross users and respect tie order") {
    val events = Seq(
      (1L, 5L, 1L, "x"), (2L, 5L, 2L, "y"),   // different users: no pair
      (3L, 7L, 3L, "a"), (3L, 7L, 4L, "b"))   // same ts: tie by event_id
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Paths.transitions(events, "user_id", "ts", "event_type",
        "event_id")
      .as[(String, String, Long, Double)].collect().toSet
    assert(got === Set(("a", "b", 1L, 1.0)))
  }

  test("invalid args rejected") {
    val df = Seq((1L, 1L, 1L, "a")).toDF("user_id", "ts", "event_id", "event_type")
    intercept[IllegalArgumentException] {
      Paths.sessionPaths(df, "user_id", "ts", "event_type", "event_id", 0L) }
    intercept[IllegalArgumentException] {
      Paths.topPaths(df.withColumn("path", lit("a")), 0) }
  }
}
