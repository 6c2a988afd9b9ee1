package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming transitions ≡ batch `Paths.transitions` across batch
  * boundaries; eviction drops chains, returning users restart. */
class StreamTransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def batchPairs(events: Seq[(Long, Long, Long, String)])
      : Map[(String, String), Long] =
    graft.operators.Paths.transitions(
      events.toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_type", "event_id")
      .select("prev", "next", "n")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("stream pairs converge to the batch operator across batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String)]
    val pairs = StreamTransitions.transitions(input.toDS().groupByKey(_._1))
    val q = pairs.writeStream.outputMode("append")
      .format("memory").queryName("trans_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-trans").toString)
      .start()
    // user 1: a@1 b@2 | b@3 c@4 (cross-batch pair b->b);
    // user 2: x@1 | x@2; same-ts tie in batch 1 for user 3
    val b1 = Seq((1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (2L, 1L, 3L, "x"),
      (3L, 5L, 4L, "m"), (3L, 5L, 5L, "n"))
    val b2 = Seq((1L, 3L, 6L, "b"), (1L, 4L, 7L, "c"), (2L, 2L, 8L, "x"))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("trans_out")
        .groupBy("prev", "next").agg(count(lit(1)).as("n"))
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got === batchPairs(b1 ++ b2))
      // the cross-batch boundary pair specifically
      assert(got(("b", "b")) === 1L)
      // tie order within equal timestamps
      assert(got(("m", "n")) === 1L)
    } finally q.stop()
  }

  test("evicted users restart their chain without a boundary pair") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String)] // (user, ts_ms, tie, type)
    val withTs = input.toDS()
      .withColumn("ets", timestamp_millis(col("_2")))
      .withWatermark("ets", "0 milliseconds")
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
    val pairs = StreamTransitions
      .transitionsFrom[(Long, Long, Long, String, java.sql.Timestamp)](
        withTs.groupByKey(_._1), _._2, _._3, _._4,
        idleTimeoutMs = Some(100L))
    val q = pairs.writeStream.outputMode("append")
      .format("memory").queryName("trans_evict")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-trans-ev").toString)
      .start()
    try {
      input.addData((1L, 1000L, 1L, "a"), (2L, 1000L, 2L, "p"))
      q.processAllAvailable()
      input.addData((2L, 5000L, 3L, "q")); q.processAllAvailable()
      // watermark 5000 > user 1's deadline 1100: state evicted
      input.addData((2L, 6000L, 4L, "r")); q.processAllAvailable()
      input.addData((1L, 7000L, 5L, "b")); q.processAllAvailable()
      val got = spark.table("trans_evict")
        .as[(Long, String, String, Long)].collect().toSet
      // user 1's b@7000 pairs with NOTHING (chain dropped); user 2
      // chains p->q->r uninterrupted
      assert(got === Set((2L, "p", "q", 5000L), (2L, "q", "r", 6000L)))
    } finally q.stop()
  }
}
