package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}
import graft.operators.Cdc
import graft.streaming.StreamDedup

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("changedSince: watched-attribute comparison, inserts and deletes") {
    val prev = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "name", "score")
    val curr = Seq((1L, "a", 10L), (2L, "B", 20L), (4L, "d", 40L))
      .toDF("id", "name", "score")
    val (changed, deleted) = Cdc.changedSince(curr, prev, Seq("id"),
      watched = Seq("name"))
    assert(changed.select("id").as[Long].collect().toSet === Set(2L, 4L))
    assert(deleted.select("id").as[Long].collect().toSet === Set(3L))
    // watched=score only → the name change is invisible
    val (c2, _) = Cdc.changedSince(curr, prev, Seq("id"), Seq("score"))
    assert(c2.select("id").as[Long].collect().toSet === Set(4L))
  }

  test("changedSince treats nulls with null-safe equality") {
    val prev = Seq((1L, Some("x")), (2L, None)).toDF("id", "v")
    val curr = Seq((1L, None: Option[String]), (2L, None)).toDF("id", "v")
    val (changed, _) = Cdc.changedSince(curr, prev, Seq("id"), Seq("v"))
    assert(changed.select("id").as[Long].collect().toSet === Set(1L))
  }
}

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components label chains and leave singletons implicit") {
    // 1-2, 2-3 chain; 8-9 pair
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("doc_a", "doc_b")
    val got = Dedup.components(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 8L, 9L -> 8L))
  }
}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF centroids train deterministically; topK returns per-query ranks") {
    val vecs = (0 until 40).map(i =>
      (i.toLong, Seq.tabulate(4)(d => ((i % 4) * 10 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(vecs, "embedding", k = 4,
      orderCol = "vec_id", iters = 3, sampleN = 40)
    assert(cents.length === 4 && cents(0).length === 4)
    // determinism across partition layouts: a 7-way repartition must
    // yield identical centroids (ordered sample, not scan-order limit)
    val cents7 = Similarity.trainCentroids(vecs.repartition(7), "embedding",
      k = 4, orderCol = "vec_id", iters = 3, sampleN = 40)
    assert(cents7.map(_.toSeq).toSeq === cents.map(_.toSeq).toSeq)
    val res = Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") < 2),
      "vec_id", "embedding", cents, nProbe = 2, k = 3)
    val byQuery = res.select("query_id", "rank")
      .as[(Long, Long)].collect().groupBy(_._1)
    assert(byQuery.keySet === Set(0L, 1L))
    byQuery.values.foreach(rs =>
      assert(rs.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L)))
  }
}

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  test("withinWatermark drops duplicates inside the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String)]
    val deduped = StreamDedup.withinWatermark(
      input.toDF().toDF("ts", "k"), "ts", "1 hour", Seq("k"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("wmdedup")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-wm").toString)
      .start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:10:00")
      input.addData((t0, "a"), (t1, "a"), (t0, "b"))
      q.processAllAvailable()
      val got = spark.table("wmdedup").collect()
      assert(got.map(_.getString(1)).sorted.toSeq === Seq("a", "b"))
    } finally q.stop()
  }

  test("firstSeen emits each key once across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val deduped = StreamDedup.firstSeen(
      input.toDS().groupByKey(_._1))
    val q = deduped.writeStream.outputMode("update")
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-sd").toString)
      .start()
    try {
      input.addData(("a", 1L), ("a", 2L), ("b", 3L))
      q.processAllAvailable()
      input.addData(("a", 4L), ("c", 5L))
      q.processAllAvailable()
      val got = spark.table("dedup_out").as[(String, Long)].collect().toSet
      assert(got.map(_._1) === Set("a", "b", "c"))
      assert(got.size === 3)
    } finally q.stop()
  }
}

class Scd2HistorySpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.Cdc

  test("collapses same-state runs into effective-dated versions") {
    val events = Seq(
      (1L, 1L, "A"), (1L, 2L, "A"), // run of A collapses
      (1L, 5L, "B"), (1L, 7L, "B"),
      (1L, 9L, "A"), // A again: NEW version, not merged with the first
      (2L, 3L, "X")).toDF("user_id", "ts_ms", "event_type")
      .withColumn("event_id", col("ts_ms") * 10)
    val got = Cdc.scd2History(events, "user_id", "event_type", "ts_ms", "event_id")
      .as[(Long, Long, String, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      (1L, 1L, "A", 1L, Some(5L)),
      (1L, 2L, "B", 5L, Some(9L)),
      (1L, 3L, "A", 9L, None),
      (2L, 1L, "X", 3L, None)))
  }

  test("equal timestamps order by the tie-break column") {
    val events = Seq(
      (1L, 10L, 2L, "B"), // same ts, higher event_id: applies second
      (1L, 10L, 1L, "A"))
      .toDF("user_id", "ts_ms", "event_id", "event_type")
    val got = Cdc.scd2History(events, "user_id", "event_type", "ts_ms", "event_id")
      .as[(Long, Long, String, Long, Option[Long])]
      .collect().sortBy(_._2).toSeq
    assert(got.map(r => (r._2, r._3)) === Seq((1L, "A"), (2L, "B")))
  }

  test("a leading NULL state opens a version; null→null runs collapse") {
    val events = Seq(
      (1L, 1L, 1L, None: Option[String]),
      (1L, 2L, 2L, None), // same (null) state: collapses, NOT a new version
      (1L, 5L, 3L, Some("A")))
      .toDF("user_id", "ts_ms", "event_id", "event_type")
    val got = Cdc.scd2History(events, "user_id", "event_type", "ts_ms", "event_id")
      .as[(Long, Long, Option[String], Long, Option[Long])]
      .collect().sortBy(_._2).toSeq
    assert(got === Seq(
      (1L, 1L, None, 1L, Some(5L)),
      (1L, 2L, Some("A"), 5L, None)))
  }
}

class DiscreteQuantilesSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.Scale

  test("matches SQL-standard PERCENTILE_DISC on hand-computed data") {
    // g1: 10,20,30,40 → p25=10 p50=20 p75=30; g2 (odd n with ties):
    // 1,1,2,5,9 → p25=1 (cum 2 ≥ ceil(1.25)=2), p50=2 (ceil(2.5)=3),
    // p75=5 (ceil(3.75)=4)
    val df = (Seq(10, 20, 30, 40).map(("g1", _)) ++
      Seq(1, 1, 2, 5, 9).map(("g2", _))).toDF("g", "v")
    val got = Scale.discreteQuantiles(df, "g", "v", Seq(0.25, 0.5, 0.75))
      .as[(String, Double, Int)].collect()
      .map { case (g, p, q) => (g, p) -> q }.toMap
    assert(got === Map(
      ("g1", 0.25) -> 10, ("g1", 0.5) -> 20, ("g1", 0.75) -> 30,
      ("g2", 0.25) -> 1, ("g2", 0.5) -> 2, ("g2", 0.75) -> 5))
  }

  test("p = 1.0 is the group max; single-row groups return the row") {
    val df = Seq(("a", 7), ("a", 3), ("b", 42)).toDF("g", "v")
    val got = Scale.discreteQuantiles(df, "g", "v", Seq(0.5, 1.0))
      .as[(String, Double, Int)].collect()
      .map { case (g, p, q) => (g, p) -> q }.toMap
    assert(got === Map(
      ("a", 0.5) -> 3, ("a", 1.0) -> 7,
      ("b", 0.5) -> 42, ("b", 1.0) -> 42))
  }

  test("NULL values are skipped, per inverse-distribution semantics") {
    val df = Seq(("a", Some(10)), ("a", None), ("a", Some(20)), ("a", None))
      .toDF("g", "v")
    val got = Scale.discreteQuantiles(df, "g", "v", Seq(0.5, 1.0))
      .as[(String, Double, Int)].collect()
      .map { case (g, p, q) => (g, p) -> q }.toMap
    // n counts only the 2 non-null values: p50 = 10, p100 = 20
    assert(got === Map(("a", 0.5) -> 10, ("a", 1.0) -> 20))
  }
}

class StreamCdcSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.streaming.StreamCdc

  test("streaming SCD2 converges to the batch operator across batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String)] // (user, ts, event_id, state)
    val updates = StreamCdc.scd2Updates(
      input.toDS().groupByKey(_._1)
        .mapValues(v => (v._2, v._3, v._4)))
    val q = updates.writeStream.outputMode("update")
      .format("memory").queryName("scd2_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-scd2").toString)
      .start()
    try {
      // batch 1: user 1 A→B mid-batch (closes A); user 2 opens X
      input.addData((1L, 1L, 1L, "A"), (1L, 2L, 2L, "A"), (1L, 5L, 3L, "B"),
        (2L, 3L, 4L, "X"))
      q.processAllAvailable()
      // batch 2: the A run RESUMES across the boundary for user 1
      // (closes B at 9), user 2 unchanged-state event (no new version)
      input.addData((1L, 9L, 5L, "A"), (2L, 8L, 6L, "X"))
      q.processAllAvailable()

      // update-mode memory sink appends every upsert; last write per
      // (key, version) is the converged row
      val got = spark.table("scd2_out")
        .withColumn("seq", monotonically_increasing_id())
        .as[(Long, Long, String, Long, Option[Long], Long)]
        .collect().groupBy(r => (r._1, r._2))
        .map { case (k, rs) => k -> { val r = rs.maxBy(_._6); (r._3, r._4, r._5) } }

      val events = Seq(
        (1L, 1L, 1L, "A"), (1L, 2L, 2L, "A"), (1L, 5L, 3L, "B"),
        (2L, 3L, 4L, "X"), (1L, 9L, 5L, "A"), (2L, 8L, 6L, "X"))
        .toDF("user_id", "ts_ms", "event_id", "event_type")
      val batch = graft.operators.Cdc
        .scd2History(events, "user_id", "event_type", "ts_ms", "event_id")
        .as[(Long, Long, String, Long, Option[Long])]
        .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

      assert(got === batch)
      assert(batch((1L, 3L)) === (("A", 9L, None))) // resumed run is v3, open
    } finally q.stop()
  }

  test("idle-timeout eviction bounds state; live keys still converge to batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String)] // (user, ts_ms, event_id, state)
    // event-time watermark drives the idle clock: zero-delay watermark
    // = max event ts of the previous batch
    val withTs = input.toDS()
      .withColumn("ets", timestamp_millis(col("_2")))
      .withWatermark("ets", "0 milliseconds")
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
    // group the watermarked row type directly — a mapValues that drops
    // the ets column would fail Spark's event-time-timeout analysis
    val updates = StreamCdc.scd2UpdatesFrom(
      withTs.groupByKey(_._1),
      (v: (Long, Long, Long, String, java.sql.Timestamp)) =>
        (v._2, v._3, v._4),
      idleTimeoutMs = Some(100L))
    val q = updates.writeStream.outputMode("update")
      .format("memory").queryName("scd2_evict")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-scd2-ev").toString)
      .start()
    try {
      // batch 1: user 1 opens A at 1000; user 2 opens X
      input.addData((1L, 1000L, 1L, "A"), (2L, 1000L, 2L, "X"))
      q.processAllAvailable()
      // batch 2: only user 2; watermark is now 1000 — user 1's
      // deadline (1100) not yet passed
      input.addData((2L, 5000L, 3L, "X"))
      q.processAllAvailable()
      // batch 3: watermark advances to 5000 > 1100 → user 1 evicted
      input.addData((2L, 6000L, 4L, "Y"))
      q.processAllAvailable()
      // batch 4: user 1 RETURNS after eviction: history restarts at
      // version 1 with eff_from 7000 (un-evicted state would have
      // collapsed the same-state run and kept eff_from 1000)
      input.addData((1L, 7000L, 5L, "A"))
      q.processAllAvailable()

      val rows = spark.table("scd2_evict")
        .withColumn("seq", monotonically_increasing_id())
        .as[(Long, Long, String, Long, Option[Long], Long)]
        .collect()
      val lastPerKeyVersion = rows.groupBy(r => (r._1, r._2))
        .map { case (k, rs) => k -> { val r = rs.maxBy(_._6); (r._3, r._4, r._5) } }
      // eviction proof: user 1's version-1 row was re-opened at 7000
      assert(lastPerKeyVersion((1L, 1L)) === (("A", 7000L, None)))
      // live key: user 2 history matches the batch operator exactly
      val liveEvents = Seq((2L, 1000L, 2L, "X"), (2L, 5000L, 3L, "X"),
        (2L, 6000L, 4L, "Y"))
        .toDF("user_id", "ts_ms", "event_id", "event_type")
      val batch = graft.operators.Cdc
        .scd2History(liveEvents, "user_id", "event_type", "ts_ms", "event_id")
        .as[(Long, Long, String, Long, Option[Long])]
        .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
      assert(lastPerKeyVersion.filter(_._1._1 == 2L) === batch)
    } finally q.stop()
  }
}

class ProfileSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Profile

  test("profiles nulls and exact distincts per column in one pass") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None),
      (Some(2), Some("b")), (None, Some("b")))
      .toDF("k", "v")
    val got = Profile.table(df, Seq("k", "v"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      "k" -> ((4L, 1L, 2L)),
      "v" -> ((4L, 1L, 2L))))
  }

  test("approx mode profiles the same shape without the Expand blowup") {
    val df = (1 to 1000).map(i => (i, i % 7)).toDF("a", "b")
    val got = Profile.table(df, Seq("a", "b"), approx = true)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    // HLL++ default rsd is 5%: budget 3 sigma on the large column
    assert(math.abs(got("a") - 1000L) <= 150)
    assert(got("b") === 7L)
    val plan = Profile.table(df, Seq("a", "b"), approx = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "approx mode must not Expand")
  }

  test("robustOutliers: disc median/MAD and the 3-MAD rule by hand") {
    // group g values: 1..9 plus a 1000 outlier; disc-median of 10
    // values = 5th element = 5; devs |x-5| = {4,3,2,1,0,1,2,3,4,995},
    // sorted {0,1,1,2,2,3,3,4,4,995}: disc-median = 2;
    // outliers: dev > 6 -> only 1000. Group h: 2 rows, mad 0 ->
    // any nonzero dev is an outlier (dev > 0 = k*0).
    val df = ((1 to 9).map(i => ("g", i.toDouble)) ++
      Seq(("g", 1000.0), ("h", 7.0), ("h", 9.0)))
      .toDF("grp", "v")
    val got = Profile.robustOutliers(df, "grp", "v", k = 3.0)
      .orderBy("grp").as[(String, Long, Double, Double, Long)]
      .collect().toSeq
    assert(got === Seq(("g", 10L, 5.0, 2.0, 1L),
      ("h", 2L, 7.0, 0.0, 1L)))
  }

  test("robustOutliers ignores nulls and stays partition-stable") {
    val df = ((1 to 50).map(i => ("g", Some(i.toDouble))) :+
      ("g", None: Option[Double])).toDF("grp", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.robustOutliers(d, "grp", "v")
        .as[(String, Long, Double, Double, Long)].collect().toSeq
    val a = run(df)
    assert(a.head._2 === 50L)
    assert(run(df.repartition(7)) === a)
    intercept[IllegalArgumentException] {
      Profile.robustOutliers(df, "grp", "v", k = 0.0) }
  }
}

class HistogramSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Profile

  test("equal-width buckets cover [min,max] with a closed top edge") {
    val df = (0 to 10).map(i => Tuple1(i.toDouble)).toDF("v")
    val got = Profile.histogram(df, "v", 5)
      .orderBy("bucket").as[(Long, Long, Double, Double)].collect().toSeq
    // width 2: [0,2) [2,4) [4,6) [6,8) [8,10]; 10 lands in the last
    assert(got.map(g => (g._1, g._2)) ===
      Seq((0L, 2L), (1L, 2L), (2L, 2L), (3L, 2L), (4L, 3L)))
    assert(got.head._3 === 0.0 && got.head._4 === 2.0)
    assert(got.last._3 === 8.0 && got.last._4 === 10.0)
  }

  test("empty buckets are absent; nulls ignored") {
    val df = Seq(Some(0.0), Some(100.0), None).toDF("v")
    val got = Profile.histogram(df, "v", 10)
      .orderBy("bucket").as[(Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._1) === Seq(0L, 9L))
    assert(got.map(_._2) === Seq(1L, 1L))
  }

  test("constant column degenerates to one bucket of width zero") {
    val df = Seq(7.0, 7.0, 7.0).toDF("v")
    val got = Profile.histogram(df, "v", 4)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq((0L, 3L, 7.0, 7.0)))
  }

  test("invalid bucket count rejected") {
    intercept[IllegalArgumentException] {
      Profile.histogram(Seq(1.0).toDF("v"), "v", 0) }
  }
}

class StandardizeSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Profile

  test("z-scores are (x - mean)/sd per group") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0),
      ("b", 30.0)).toDF("g", "v")
    val got = Profile.standardize(df, "v", "g")
      .orderBy("g", "v").select("z").as[Double].collect().toSeq
    // group a: mean 2 sd 1; group b: mean 20 sd sqrt(200)
    assert(got(0) === -1.0 && got(1) === 0.0 && got(2) === 1.0)
    assert(math.abs(got(3) - (-10.0 / math.sqrt(200))) < 1e-12)
  }

  test("singleton and zero-variance groups yield null z") {
    val df = Seq(("solo", 5.0), ("flat", 2.0), ("flat", 2.0))
      .toDF("g", "v")
    val got = Profile.standardize(df, "v", "g")
      .select("z").as[Option[Double]].collect().toSeq
    assert(got.forall(_.isEmpty))
  }

  test("input columns pass through") {
    val df = Seq(("a", 1.0, "k"), ("a", 3.0, "m")).toDF("g", "v", "tag")
    val got = Profile.standardize(df, "v", "g")
    assert(got.columns.toSet === Set("g", "v", "tag", "z"))
  }
}
