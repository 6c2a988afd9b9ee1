package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-2 hazard fixes: outbox null-key compaction loss (ADVICE
  * high), single-encode too-large split, range-join floor binning. */
class NullKeySplitSpec extends SparkSpec {
  import spark.implicits._

  test("drainBatch never compacts unkeyed messages on a compacted topic") {
    val staged = Seq(
      (1L, "t1", Option("k"), "m1"), (2L, "t1", Option("k"), "m2"),
      (3L, "t1", Option.empty[String], "u1"),
      (4L, "t1", Option.empty[String], "u2"),
      (5L, "t2", Option.empty[String], "v1"))
      .toDF("id", "topic", "key", "payload")
    val drained = Outbox.drainBatch(staged, "topic", "id", "key",
      compactAll = true)
    val got = drained.select("payload").as[String].collect().toSet
    // keyed pair compacts to the last write; all three unkeyed rows
    // survive (reference blank-key guard, outbox_producer.rb:218-219)
    assert(got === Set("m2", "u1", "u2", "v1"))
  }

  test("drainBatch per-topic compaction keeps unkeyed rows too") {
    val staged = Seq(
      (1L, "c", Option("k"), "a"), (2L, "c", Option("k"), "b"),
      (3L, "c", Option.empty[String], "u"),
      (4L, "p", Option("k"), "x"), (5L, "p", Option("k"), "y"))
      .toDF("id", "topic", "key", "payload")
    val got = Outbox.drainBatch(staged, "topic", "id", "key",
      compactTopics = Set("c"))
      .select("payload").as[String].collect().toSet
    assert(got === Set("b", "u", "x", "y"))
  }

  test("splitTooLarge encodes once per row: both sides scan the cached frame") {
    import graft.model.{KeyConfig, TopicConfig}
    import graft.produce.Producer
    import graft.schema.PlainJsonBackend
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("wid", StringType),
      StructField("body", StringType),
      StructField("message_id", StringType),
      StructField("timestamp", StringType)))
    val backend = new PlainJsonBackend(schema)
    val payloads = Seq(("w1", "x"), ("w2", "y" * 500)).toDF("wid", "body")
      .withColumn("message_id", lit("m")).withColumn("timestamp", lit("t"))
    val framed = graft.streaming.Streams.toKafkaFrame(payloads,
      TopicConfig("t", "W", keyConfig = KeyConfig.NoKey), backend)
    val (ok, tooLarge, release) = Producer.splitTooLarge(framed, Some(200))
    try {
      assert(ok.count() === 1 && tooLarge.count() === 1)
      // the encode expression must not re-run per side: each side's
      // physical plan reads the cache, not the raw produce chain
      assert(ok.queryExecution.executedPlan.toString
        .contains("InMemoryTableScan"))
      assert(tooLarge.queryExecution.executedPlan.toString
        .contains("InMemoryTableScan"))
    } finally release()
  }

  test("timeWindow bins negative (pre-epoch) timestamps correctly") {
    // floor division: ts=-1 with width 10 must land in bin -1, not bin
    // 0 — truncation toward zero would silently drop boundary matches
    val probe = Seq((1L, -1L), (2L, -15L)).toDF("pid", "ts")
    val build = Seq((10L, -3L), (20L, -14L), (30L, 2L)).toDF("bid", "bts")
    val got = RangeJoin.timeWindow(probe, build,
      col("ts"), col("bts"), before = 5L, after = 5L)
      .select("pid", "bid").as[(Long, Long)].collect().toSet
    // pid 1 (ts -1): window [-6, 4] → bids at -3 and 2
    // pid 2 (ts -15): window [-20, -10] → bid at -14
    assert(got === Set((1L, 10L), (1L, 30L), (2L, 20L)))
  }
}
