package graft.streaming

import graft.SparkSpec
import graft.ext.Multimodal

/** `StreamNearDup.screenAgainst` — the streaming twin of the x138
  * bipartite screen: arrivals stream against a FROZEN reference with
  * zero state (stream-static bucket join + lowest-SURVIVING-equal-
  * chunk filter). Pins: cross-only pairs, exactly one row per pair
  * per delivery, batch-operator equivalence, the cap's drop-and-
  * report contract (including the case where the LOWEST equal chunk
  * is the hot one — the emission rule must move to the next
  * surviving bucket, not kill the pair), and a RocksDB-provider run
  * (the operator needs no state store, so the provider setting must
  * be inert — the same pipeline answer). */
class StreamBipartiteScreenSpec extends SparkSpec {
  import spark.implicits._

  private val H0 = 0x1234_5678_9ABC_DEF0L
  private val H1 = H0 ^ 1L             // ham 1 vs H0
  private val FAR = 0x0F0F_F0F0_5A5A_A5A5L

  private def refDf(rows: (Long, Long)*) = rows.toDF("id", "ph")

  private def runStream(ref: org.apache.spark.sql.DataFrame,
      name: String, maxBucket: Option[Int] = None)(
      feed: (org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)],
             org.apache.spark.sql.streaming.StreamingQuery) => Unit)
      : Set[(Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val (pairs, _) = StreamNearDup.screenAgainst(ref,
      input.toDF().toDF("id", "ph"), "id", "ph", maxBucket = maxBucket)
    val q = pairs.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"graft-sbs-$name").toString)
      .start()
    try feed(input, q) finally q.stop()
    spark.table(name).as[(Long, Long, Long)].collect().toSet
  }

  test("arrivals pair cross-only, once each, matching the batch operator") {
    val ref = refDf((100L, H0), (101L, FAR))
    val out = runStream(ref, "sbs1") { (input, q) =>
      input.addData((1L, H1), (2L, H0)) // 2 shares ALL 4 chunks with 100
      q.processAllAvailable()
      input.addData((3L, H1)) // same hash as arrival 1: must NOT pair with it
      q.processAllAvailable()
    }
    assert(out === Set((1L, 100L, 1L), (2L, 100L, 0L), (3L, 100L, 1L)))
    // batch equivalence on the union of arrivals
    val batch = Multimodal.hashNearDupAgainst(
      Seq((1L, H1), (2L, H0), (3L, H1)).toDF("id", "ph"), ref, "id", "ph")
      .as[(Long, Long, Long)].collect().toSet
    assert(batch === out)
  }

  test("the streaming plan carries ZERO state operators (the design claim)") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val (pairs, _) = StreamNearDup.screenAgainst(refDf((100L, H0)),
      input.toDF().toDF("id", "ph"), "id", "ph")
    val q = pairs.writeStream.outputMode("append")
      .format("memory").queryName("sbs0")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-sbs0").toString)
      .start()
    try {
      input.addData((1L, H1))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "frozen-reference screening must not allocate state: " +
          q.lastProgress.stateOperators.mkString(","))
    } finally q.stop()
  }

  test("emission count is exactly 1 even when all four chunks collide") {
    val ref = refDf((100L, H0))
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val (pairs, _) = StreamNearDup.screenAgainst(ref,
      input.toDF().toDF("id", "ph"), "id", "ph")
    val q = pairs.writeStream.outputMode("append")
      .format("memory").queryName("sbs2")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-sbs2").toString)
      .start()
    try {
      input.addData((1L, H0))
      q.processAllAvailable()
    } finally q.stop()
    // COUNT, not set: four buckets all match — only chunk 0 may speak
    assert(spark.table("sbs2").count() === 1L)
  }

  test("hot LOWEST chunk: pair still emitted via the next surviving bucket") {
    // refs 100/101 share chunks 0, 2, 3 — at cap 1 those buckets are
    // hot and dropped. The arrival equals ref 100 EVERYWHERE, so its
    // lowest EQUAL chunk (0) is hot: the emission rule must move to
    // the lowest SURVIVING bucket (chunk 1), not kill the pair. Pair
    // (1, 101)'s equal chunks are exactly the hot ones {0, 2, 3} —
    // legitimately missed under the drop-and-report contract, and the
    // overflow frame names all three buckets.
    val refB = H0 ^ (1L << 17) // differs in chunk 1 only
    val ref = refDf((100L, H0), (101L, refB))
    val (pairsDf, overflow) = StreamNearDup.screenAgainst(ref,
      Seq((1L, H0)).toDF("id", "ph"), "id", "ph", maxBucket = Some(1))
    val got = pairsDf.as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 100L, 0L)))
    val hot = overflow.as[(Int, Long, Long)].collect().toSet
    assert(hot === Set(
      (0, H0 & 0xffffL, 2L),
      (2, (H0 >>> 32) & 0xffffL, 2L),
      (3, (H0 >>> 48) & 0xffffL, 2L)))
  }

  test("pair missed only when ALL its equal chunks are hot; reported") {
    // three identical ref docs: every chunk bucket holds 3 > cap 2 ⇒
    // all four dropped; the arrival finds nothing, overflow says why
    val ref = refDf((100L, H0), (101L, H0), (102L, H0))
    val (pairsDf, overflow) = StreamNearDup.screenAgainst(ref,
      Seq((1L, H0)).toDF("id", "ph"), "id", "ph", maxBucket = Some(2))
    assert(pairsDf.count() === 0L)
    assert(overflow.count() === 4L)
  }

  test("broadcast-set regime (hot keys > literal max) emits the identical pairs and overflow") {
    // the two hotness regimes — per-chunk literal arrays vs one
    // broadcast hash set probed by a UDF — must be observationally
    // identical; the spec forces the UDF regime onto the same small
    // fixtures by injecting hotKeyLiteralMax = 0 and replays the two
    // cap scenarios above
    val refB = H0 ^ (1L << 17)
    for ((ref, arrivals, cap) <- Seq(
      (refDf((100L, H0), (101L, refB)), Seq((1L, H0)), 1),
      (refDf((100L, H0), (101L, H0), (102L, H0)), Seq((1L, H0)), 2))) {
      val (pLit, oLit) = StreamNearDup.screenAgainst(ref,
        arrivals.toDF("id", "ph"), "id", "ph", maxBucket = Some(cap))
      val (pSet, oSet) = StreamNearDup.screenAgainst(ref,
        arrivals.toDF("id", "ph"), "id", "ph", maxBucket = Some(cap),
        hotKeyLiteralMax = 0)
      assert(pSet.as[(Long, Long, Long)].collect().toSet ===
        pLit.as[(Long, Long, Long)].collect().toSet, s"pairs (cap=$cap)")
      assert(oSet.as[(Int, Long, Long)].collect().toSet ===
        oLit.as[(Int, Long, Long)].collect().toSet, s"overflow (cap=$cap)")
      // plan pin: the literal regime embeds hot keys in the plan
      // (array_contains over literals), the broadcast-set regime must
      // NOT — its plan stays constant-size however many keys are hot
      val litPlan = pLit.queryExecution.executedPlan.toString
      val setPlan = pSet.queryExecution.executedPlan.toString
      assert(litPlan.contains("array_contains"), "literal regime plan")
      assert(!setPlan.contains("array_contains"), "broadcast-set regime plan")
    }
  }

  test("radius-7 screen streams with ZERO state; pairs at hamming 4-7 arrive once") {
    implicit val sqlCtx = spark.sqlContext
    // reference member 6 bits from the arrival (beyond any equal
    // 16-bit chunk in the touched chunk, found via the 1-bit ball on
    // an untouched chunk), plus a hamming-9 member that must NOT pair
    val h9 = H0 ^ 0x1ffL // 9 bits, chunk 0
    val ref = refDf((100L, H0 ^ 0x3fL), (101L, h9))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val (pairs, _) = StreamNearDup.screenAgainst(ref,
      input.toDF().toDF("id", "ph"), "id", "ph", maxHamming = 7)
    val q = pairs.writeStream.outputMode("append")
      .format("memory").queryName("sbs7")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-sbs7").toString)
      .start()
    try {
      input.addData((1L, H0))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "radius-7 screening must stay stateless")
    } finally q.stop()
    assert(spark.table("sbs7").as[(Long, Long, Long)].collect().toSeq ===
      Seq((1L, 100L, 6L)))
  }

  test("RocksDB provider is inert: stateless plan, same answer") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = runStream(refDf((100L, H0)), "sbs5") { (input, q) =>
        input.addData((1L, H1))
        q.processAllAvailable()
      }
      assert(out === Set((1L, 100L, 1L)))
    } finally prev match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }
}
