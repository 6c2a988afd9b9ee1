package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for streaming recency-decayed counters. */
class StreamDecaySpec extends SparkSpec {
  import spark.implicits._

  private val Tau = 100.0

  private def batchScores(events: Seq[(Long, Long)]): Map[Long, (Long, Double)] = {
    // per-key reference (own max ts), the same semantics the stream
    // maintains incrementally
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    graft.operators.Decay.recencyScore(
      events.toDF("user_id", "ts"), "user_id", "ts", Tau,
      refTime = Some(max(col("ts")).over(w)))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("stream converges to the batch operator across batch boundaries and disorder") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val counts = StreamDecay.decayedCounts(
      input.toDS().groupByKey(_._1), tau = Tau)
    val q = counts.writeStream.outputMode("update")
      .format("memory").queryName("decay_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-decay").toString)
      .start()
    val b1 = Seq((1L, 100L), (1L, 50L), (2L, 10L))   // late event in-batch
    val b2 = Seq((1L, 30L), (1L, 200L), (2L, 20L))   // late event ACROSS batches
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("decay_out")
        .withColumn("seq", monotonically_increasing_id())
        .as[(Long, Long, Long, Double, Long)].collect()
        .groupBy(_._1)
        .map { case (k, rs) => k -> { val r = rs.maxBy(_._5); (r._2, r._3, r._4) } }
      val expect = batchScores(b1 ++ b2)
      assert(got.keySet === expect.keySet)
      got.foreach { case (k, (n, tRef, score)) =>
        assert(n === expect(k)._1, s"key $k count")
        assert(tRef === (b1 ++ b2).filter(_._1 == k).map(_._2).max)
        assert(math.abs(score - expect(k)._2) < 1e-9,
          s"key $k: stream $score vs batch ${expect(k)._2}")
      }
    } finally q.stop()
  }

  test("idle keys evict; live keys keep exact counters") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)] // (user, ts_ms)
    val withTs = input.toDS()
      .withColumn("ets", timestamp_millis(col("_2")))
      .withWatermark("ets", "0 milliseconds")
      .as[(Long, Long, java.sql.Timestamp)]
    val counts = StreamDecay.decayedCountsFrom[(Long, Long, java.sql.Timestamp)](
      withTs.groupByKey(_._1), _._2, tau = 1000.0,
      idleTimeoutMs = Some(100L))
    val q = counts.writeStream.outputMode("update")
      .format("memory").queryName("decay_evict")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-decay-ev").toString)
      .start()
    try {
      input.addData((1L, 1000L), (2L, 1000L)); q.processAllAvailable()
      // watermark 1000; key 1 deadline 1100 not yet passed
      input.addData((2L, 5000L)); q.processAllAvailable()
      // watermark 5000 > 1100: key 1 evicted silently
      input.addData((2L, 6000L)); q.processAllAvailable()
      // key 1 returns after eviction: restarts from scratch (n = 1)
      input.addData((1L, 7000L)); q.processAllAvailable()
      val rows = spark.table("decay_evict")
        .withColumn("seq", monotonically_increasing_id())
        .as[(Long, Long, Long, Double, Long)].collect()
      val last = rows.groupBy(_._1)
        .map { case (k, rs) => k -> { val r = rs.maxBy(_._5); (r._2, r._3, r._4) } }
      assert(last(1L)._1 === 1L, "returned key restarted from zero")
      assert(last(1L)._2 === 7000L)
      // live key 2: n=3, score vs its own t_ref 6000
      val s2 = math.exp((1000.0 - 6000.0) / 1000.0) +
        math.exp((5000.0 - 6000.0) / 1000.0) + 1.0
      assert(last(2L)._1 === 3L)
      assert(math.abs(last(2L)._3 - s2) < 1e-9)
    } finally q.stop()
  }

  test("invalid args rejected") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    intercept[IllegalArgumentException] {
      StreamDecay.decayedCounts(input.toDS().groupByKey(_._1), tau = 0.0) }
    intercept[IllegalArgumentException] {
      StreamDecay.decayedCountsFrom[(Long, Long)](
        input.toDS().groupByKey(_._1), _._2, tau = 1.0,
        idleTimeoutMs = Some(0L)) }
  }
}
