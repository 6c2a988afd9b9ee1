package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cohorts, Rolling}

/** Specs for cohort retention and trailing-window aggregates. */
class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("retention matrix matches the hand-computed cells") {
    // period = 10; user 1 first at 5 (cohort 0), active periods 0,1,3;
    // user 2 first at 12 (cohort 1), active periods 1,1 (dup event)
    val events = Seq(
      (1L, 5L), (1L, 15L), (1L, 35L), (1L, 7L),
      (2L, 12L), (2L, 19L))
      .toDF("user_id", "ts")
    val got = Cohorts.retention(events, "user_id", "ts", periodNs = 10L)
      .orderBy("cohort", "period_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L)))
  }

  test("period boundary is exact integer floor division") {
    // ts = exactly one period -> cohort 1, not 0; and a timestamp past
    // 2^53 (where doubles lose integer precision) stays exact
    val big = 1152921504606846976L // 2^60, an exact period multiple
    val events = Seq((1L, 10L), (2L, big), (2L, big + 9L))
      .toDF("user_id", "ts")
    val got = Cohorts.retention(events, "user_id", "ts", periodNs = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 0L, 1L)))
    assert(got.contains((big / 10L, 0L, 1L)))
  }

  test("distinct users counted once per cell") {
    val events = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L))
      .toDF("user_id", "ts")
    val got = Cohorts.retention(events, "user_id", "ts", periodNs = 100L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 0L, 2L)))
  }

  test("invalid period rejected") {
    intercept[IllegalArgumentException] {
      Cohorts.retention(Seq((1L, 1L)).toDF("u", "ts"), "u", "ts", 0L) }
  }

  test("trailing frame covers [t - window, t] inclusive") {
    val events = Seq((1L, 0L, 10.0), (1L, 30L, 20.0), (1L, 31L, 40.0),
      (1L, 100L, 1.0)).toDF("id", "ts", "v")
      .withColumn("user", lit(1L))
    val got = Rolling.trailing(events, "user", "ts", windowSize = 30L,
      aggs = Seq("n" -> count(lit(1)), "s" -> sum(col("v"))))
      .orderBy("ts").select("ts", "n", "s")
      .as[(Long, Long, Double)].collect().toSeq
    // t=0: itself; t=30: 0 and 30 (inclusive left edge); t=31: 30,31
    // (0 is now outside); t=100: itself
    assert(got === Seq((0L, 1L, 10.0), (30L, 2L, 30.0),
      (31L, 2L, 60.0), (100L, 1L, 1.0)))
  }

  test("equal timestamps are frame peers regardless of row order") {
    val events = Seq((1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 5L, 4.0))
      .toDF("id", "ts", "v").withColumn("user", lit(1L))
    val got = Rolling.trailing(events.repartition(5), "user", "ts",
      windowSize = 4L, aggs = Seq("n" -> count(lit(1))))
      .select("id", "n").as[(Long, Long)].collect().toSet
    // both ts=10 rows see each other (peers), neither sees ts=5
    assert(got === Set((1L, 2L), (2L, 2L), (3L, 1L)))
  }

  test("keys never mix") {
    val events = Seq((1L, 10L), (2L, 10L), (2L, 11L))
      .toDF("user", "ts").withColumn("id", col("ts"))
    val got = Rolling.trailing(events, "user", "ts", windowSize = 100L,
      aggs = Seq("n" -> count(lit(1))))
      .select("user", "n").as[(Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 1L), (2L, 1L), (2L, 2L)))
  }

  test("invalid rolling args rejected") {
    val df = Seq((1L, 1L)).toDF("u", "ts")
    intercept[IllegalArgumentException] {
      Rolling.trailing(df, "u", "ts", -1L, Seq("n" -> count(lit(1)))) }
    intercept[IllegalArgumentException] {
      Rolling.trailing(df, "u", "ts", 1L, Nil) }
  }
}
