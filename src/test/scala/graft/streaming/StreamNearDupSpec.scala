package graft.streaming

import graft.SparkSpec
import graft.ext.Multimodal

import StreamNearDup.{HashedDoc, NearDupPair}

/** Streaming near-dup: incremental pairs must EQUAL the batch
  * operator's output on the union of all batches, arrive exactly once
  * (the lowest-equal-chunk rule), in the micro-batch of the later
  * member, survive at-least-once redelivery, and respect the bucket
  * cap's drop-and-report contract. */
class StreamNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def startQuery(name: String,
      input: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]) = {
    val out = StreamNearDup.pairs(
      input.toDS().map { case (id, h) => HashedDoc(id, h) })
    out.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"graft-snd-$name").toString)
      .start()
  }

  private def table(name: String): Set[(Long, Long, Int)] =
    spark.table(name).as[NearDupPair].collect()
      .map(p => (p.idA, p.idB, p.hamming)).toSet

  // fixture hashes: base values far apart, planted near pairs
  private val H0 = 0x1234_5678_9ABC_DEF0L
  private val H1 = H0 ^ 1L            // ham 1 vs H0
  private val H2 = H0 ^ (1L << 17) ^ (1L << 63) // ham 2 vs H0
  private val FAR = 0x0F0F_F0F0_5A5A_A5A5L

  test("pairs arrive once, in the later member's batch, matching batch op") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = startQuery("snd1", input)
    try {
      input.addData((1L, H0), (2L, FAR))
      q.processAllAvailable()
      assert(table("snd1") === Set.empty)
      input.addData((3L, H1)) // meets 1 at ham 1 — in THIS batch
      q.processAllAvailable()
      assert(table("snd1") === Set((1L, 3L, 1)))
      input.addData((4L, H2), (5L, H0)) // same-batch arrivals
      q.processAllAvailable()
      // 4 vs 1 (ham 2), 4 vs 3 (ham 3), 4 vs 5 (ham 2),
      // 5 vs 1 (ham 0), 5 vs 3 (ham 1) — each exactly once even
      // though identical hashes share ALL FOUR chunks
      val expect = Set((1L, 3L, 1), (1L, 4L, 2), (3L, 4L, 3),
        (4L, 5L, 2), (1L, 5L, 0), (3L, 5L, 1))
      assert(table("snd1") === expect)
      // batch equivalence: the batch operator on the union agrees
      val all = Seq((1L, H0), (2L, FAR), (3L, H1), (4L, H2), (5L, H0))
      val batch = Multimodal.hashNearDup(all.toDF("id", "ph"), "id", "ph")
        .as[(Long, Long, Long)].collect()
        .map(p => (p._1, p._2, p._3.toInt)).toSet
      assert(batch === expect)
    } finally q.stop()
  }

  test("at-least-once redelivery neither re-pairs nor re-admits") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = startQuery("snd2", input)
    try {
      input.addData((1L, H0), (3L, H1))
      q.processAllAvailable()
      input.addData((1L, H0)) // redelivered verbatim
      q.processAllAvailable()
      assert(table("snd2") === Set((1L, 3L, 1)))
    } finally q.stop()
  }

  test("bucket cap: overflow stops admission but arrivals still pair") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val out = StreamNearDup.pairs(
      input.toDS().map { case (id, h) => HashedDoc(id, h) },
      maxBucket = 2)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("snd3")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-snd3").toString)
      .start()
    try {
      // ids 1,2 admitted everywhere; 3 overflows every bucket of H0's
      // chunks (identical hashes share all four)
      input.addData((1L, H0), (2L, H0), (3L, H0))
      q.processAllAvailable()
      // 3 still PAIRED against the stored 1 and 2 before being dropped
      assert(table("snd3") === Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
      // but 4 cannot meet 3 (3 was never admitted) — the documented
      // missed-pair trade; 4 pairs with the stored 1 and 2
      input.addData((4L, H0))
      q.processAllAvailable()
      assert(table("snd3") === Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0),
        (1L, 4L, 0), (2L, 4L, 0)))
    } finally q.stop()
  }

  test("redelivery of an overflow-REJECTED doc re-pairs (documented trade)") {
    // the bounded-state design cannot remember rejections: a doc the
    // full bucket turned away re-pairs on redelivery — pinned here so
    // the scaladoc's contract stays honest (review finding, round 11)
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val out = StreamNearDup.pairs(
      input.toDS().map { case (id, h) => HashedDoc(id, h) },
      maxBucket = 1)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("snd_redeliver_rejected")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-snd-rr").toString)
      .start()
    try {
      input.addData((1L, H0)) // fills every bucket of H0's chunks
      q.processAllAvailable()
      input.addData((2L, H0)) // pairs with 1, rejected everywhere
      q.processAllAvailable()
      input.addData((2L, H0)) // redelivered: 2 was never admitted
      q.processAllAvailable()
      val rows = spark.table("snd_redeliver_rejected")
        .as[NearDupPair].collect()
        .map(p => (p.idA, p.idB, p.hamming))
      // the pair appears TWICE — once per delivery of the rejected doc
      assert(rows.count(_ == ((1L, 2L, 0))) === 2)
    } finally q.stop()
  }

  test("far hashes never pair; hamming-4 misses the threshold") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = startQuery("snd4", input)
    try {
      input.addData((1L, H0), (2L, FAR), (3L, H0 ^ 0x0FL)) // ham 4 vs 1
      q.processAllAvailable()
      assert(table("snd4") === Set.empty)
    } finally q.stop()
  }

  test("semantics hold on the RocksDB state store (scale provider)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long)]
      val q = startQuery("snd_rocks", input)
      try {
        input.addData((1L, H0), (2L, FAR))
        q.processAllAvailable()
        input.addData((3L, H1), (5L, H0))
        q.processAllAvailable()
        assert(table("snd_rocks") ===
          Set((1L, 3L, 1), (1L, 5L, 0), (3L, 5L, 1)))
        val metrics = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
          .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
          .filter(_.toLowerCase.contains("rocksdb"))
        assert(metrics.nonEmpty, "rocksdb provider did not engage")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("radius 7 streams on RocksDB: 8-bit buckets, hamming 4-7 pairs once each") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long)]
      val out = StreamNearDup.pairs(
        input.toDS().map { case (id, h) => HashedDoc(id, h) }, maxHamming = 7)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("snd_r7")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-snd-r7").toString)
        .start()
      try {
        val h6 = H0 ^ 0x3fL          // ham 6 vs H0 (inside chunk 0)
        val h9 = H0 ^ 0x1ffL         // ham 9: past the threshold
        input.addData((1L, H0), (2L, FAR))
        q.processAllAvailable()
        input.addData((3L, h6), (4L, h9))
        q.processAllAvailable()
        // (1,3) at hamming 6 — exactly once even though SEVEN of the
        // eight 8-bit chunks are equal; h9 is 9 from H0 (excluded) but
        // only 3 from h6 (same-batch pair, later member emits)
        assert(table("snd_r7") === Set((1L, 3L, 6), (3L, 4L, 3)))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("random corpus: incremental equals batch operator exactly") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    // random hashes plus planted neighbors, split over three batches
    val base = (0 until 40).map(i => (i.toLong, rnd.nextLong()))
    val near = (0 until 10).map(i =>
      (100L + i, base(i)._2 ^ (1L << rnd.nextInt(64))))
    val all = rnd.shuffle(base ++ near)
    val batches = all.grouped(17).toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = startQuery("snd5", input)
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val batchOp = Multimodal.hashNearDup(all.toDF("id", "ph"), "id", "ph")
        .as[(Long, Long, Long)].collect()
        .map(p => (p._1, p._2, p._3.toInt)).toSet
      assert(table("snd5") === batchOp)
      assert(batchOp.size >= 10, "fixture must contain the planted pairs")
    } finally q.stop()
  }
}
