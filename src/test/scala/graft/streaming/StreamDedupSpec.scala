package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the bounded-state first-seen dedup (firstSeenTtl). The
  * unbounded firstSeen path is covered in CdcAndGroupsSpec/PropertySpec;
  * here: TTL semantics — dedup inside the horizon, eviction past it,
  * deterministic in-batch representative.
  */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  // (fingerprint, ts_ms, payload)
  private def start(ttlMs: Long) = {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String)]
    val withTs = input.toDS()
      .withColumn("ets", timestamp_millis(col("_2")))
      .withWatermark("ets", "0 milliseconds")
      .as[(Long, Long, String, java.sql.Timestamp)]
    val out = StreamDedup.firstSeenTtl[Long, (Long, Long, String, java.sql.Timestamp)](
      withTs.groupByKey(_._1), _._2, idleTimeoutMs = ttlMs)
      .map(r => (r._1, r._2, r._3))
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("dedup_ttl")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-sdedup").toString)
      .start()
    (input, q)
  }

  test("duplicates within the horizon drop; evicted keys re-emit") {
    val (input, q) = start(ttlMs = 100L)
    try {
      // batch 1: key 1 first seen (two copies in-batch — earliest wins),
      // key 2 first seen
      input.addData((1L, 1000L, "late"), (1L, 900L, "first"), (2L, 1000L, "k2"))
      q.processAllAvailable()
      // batch 2: watermark 1000; key 1 deadline 1100 still ahead →
      // duplicate drops. key 3 advances the watermark to 5000.
      input.addData((1L, 1050L, "dup"), (3L, 5000L, "k3"))
      q.processAllAvailable()
      // batch 3: watermark 5000 passed key 1's deadline → state gone →
      // the same fingerprint re-emits (documented trade)
      input.addData((1L, 6000L, "revived"))
      q.processAllAvailable()
      val got = spark.table("dedup_ttl").as[(Long, Long, String)].collect().toSet
      assert(got === Set(
        (1L, 900L, "first"),
        (2L, 1000L, "k2"),
        (3L, 5000L, "k3"),
        (1L, 6000L, "revived")))
    } finally q.stop()
  }

  test("inside one long horizon it equals unbounded first-seen") {
    val (input, q) = start(ttlMs = 1000000L)
    try {
      input.addData((1L, 1000L, "a"), (2L, 1500L, "b"))
      q.processAllAvailable()
      input.addData((1L, 2000L, "dup"), (2L, 2500L, "dup"), (3L, 3000L, "c"))
      q.processAllAvailable()
      val got = spark.table("dedup_ttl").as[(Long, Long, String)].collect().toSet
      assert(got === Set((1L, 1000L, "a"), (2L, 1500L, "b"), (3L, 3000L, "c")))
    } finally q.stop()
  }

  test("invalid ttl rejected") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String)]
    intercept[IllegalArgumentException] {
      StreamDedup.firstSeenTtl[Long, (Long, Long, String)](
        input.toDS().groupByKey(_._1), _._2, idleTimeoutMs = 0L)
    }
  }
}
