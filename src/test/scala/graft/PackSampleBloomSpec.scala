package graft

import org.apache.spark.sql.functions._

import graft.ext.{Packing, Sampling}
import graft.operators.{Cdc, Scale}

/** Specs for the round-4 pipeline operators: sequence packing,
  * stratified sampling, bloom semi-join, snapshot diff.
  */
class PackSampleBloomSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- packing

  test("prefixSum matches the single-window formulation across buckets") {
    val df = Seq((0L, 3L), (1L, 5L), (7L, 2L), (10L, 4L), (23L, 1L), (40L, 6L))
      .toDF("id", "n")
    // bucketSize=10 forces multiple buckets with uneven occupancy
    val got = Packing.prefixSum(df, "id", col("n"), "ps", bucketSize = 10L)
      .orderBy("id").select("id", "ps").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((0L, 0L), (1L, 3L), (7L, 8L), (10L, 10L),
      (23L, 14L), (40L, 15L)))
  }

  test("concatChunk assigns sequence positions and span counts") {
    // window=10: doc0 tokens [0,7) seq0; doc1 [7,19) spans seq0..1;
    // doc2 empty; doc3 [19,30) spans seq1..2 ending exactly at 30
    val df = Seq((0L, 7L), (1L, 12L), (2L, 0L), (3L, 11L)).toDF("id", "n")
    val got = Packing.concatChunk(df, "id", col("n"), window = 10L,
      bucketSize = 2L)
      .orderBy("id")
      .select("id", "start_tok", "seq_id", "seq_off", "n_seqs")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq(
      (0L, 0L, 0L, 0L, 1L),
      (1L, 7L, 0L, 7L, 2L),
      (2L, 19L, 1L, 9L, 0L),
      (3L, 19L, 1L, 9L, 2L)))
  }

  test("prefixSum matches naive serial cumsum on random data (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(1, 120)
      ids <- Gen.listOfN(n, Gen.choose(0L, 5000L)).map(_.distinct)
      vals <- Gen.listOfN(ids.length, Gen.choose(0L, 900L))
    } yield ids.zip(vals)
    (1 to 12).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
      .foreach { rows =>
        val df = rows.toDF("id", "n")
        val got = Packing.prefixSum(df, "id", col("n"), "ps",
          bucketSize = 64L)
          .select("id", "ps").as[(Long, Long)].collect().toMap
        var acc = 0L
        rows.sortBy(_._1).foreach { case (id, n) =>
          assert(got(id) === acc, s"id=$id")
          acc += n
        }
      }
  }

  test("binPackFFD never overfills for random sizes (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(1, 150)
      sizes <- Gen.listOfN(n, Gen.choose(1L, 200L))
    } yield sizes.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    (1 to 8).flatMap(i => gen.apply(Gen.Parameters.default, Seed(100L + i)))
      .foreach { rows =>
        val out = Packing.binPackFFD(rows.toDF("id", "n"), "id", col("n"),
          budget = 128L, numPartitions = 3)
          .as[(Long, Long, Long, Long)].collect()
        assert(out.length === rows.length)
        out.groupBy(_._3).foreach { case (bin, rs) =>
          val tot = rs.map(_._2).sum
          // a bin may exceed budget ONLY as a singleton oversize doc
          assert(tot <= 128L || rs.length == 1,
            s"bin $bin overfull with ${rs.length} docs tot=$tot")
        }
      }
  }

  test("prefixSum plan: corpus window is bucket-partitioned, offsets broadcast") {
    val df = spark.range(0, 1000).toDF("id").withColumn("n", lit(3L))
    val plan = Packing.prefixSum(df, "id", col("n"), "ps", bucketSize = 100L)
      .queryExecution.executedPlan.toString
    // the full-data window must carry the bucket partition spec —
    // an unpartitioned Window over the corpus would be the 100 TB
    // single-task trap this operator exists to avoid
    assert(plan.contains("BroadcastExchange"), plan)
    val corpusWindow = plan.split("\n")
      .find(l => l.contains("Window") && l.contains("__local"))
    assert(corpusWindow.exists(_.contains("__bucket")),
      s"corpus window not bucket-partitioned:\n$plan")
  }

  test("prefixSum stays correct when a bucket is empty") {
    val df = Seq((0L, 1L), (35L, 2L), (36L, 3L)).toDF("id", "n") // bucket 1,2 empty
    val got = Packing.prefixSum(df, "id", col("n"), "ps", bucketSize = 10L)
      .orderBy("id").select("ps").as[Long].collect()
    assert(got.toSeq === Seq(0L, 1L, 3L))
  }

  test("binPackFFD respects the budget, assigns all docs, and is deterministic") {
    val df = (1L to 200L).map(i => (i, (i * 37 % 90) + 1)).toDF("id", "n")
    val packed = Packing.binPackFFD(df, "id", col("n"), budget = 128L,
      numPartitions = 4)
    val rows = packed.as[(Long, Long, Long, Long)].collect()
    assert(rows.length === 200) // every doc assigned
    val byBin = rows.groupBy(_._3).map { case (b, rs) => b -> rs.map(_._2).sum }
    assert(byBin.values.forall(_ <= 128L), s"overfull bin: $byBin")
    // deterministic: identical assignment on a re-run
    val again = Packing.binPackFFD(df, "id", col("n"), budget = 128L,
      numPartitions = 4).as[(Long, Long, Long, Long)].collect()
    assert(rows.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // FFD efficiency: total tokens / budget is a lower bound on bins;
    // greedy-desc should land within 2x of it on this distribution
    val lower = math.ceil(rows.map(_._2).sum.toDouble / 128).toLong
    assert(byBin.size <= 2 * lower, s"bins=${byBin.size} lower=$lower")
  }

  test("binPackFFD gives an oversized doc its own bin without failing") {
    val df = Seq((1L, 500L), (2L, 60L), (3L, 60L)).toDF("id", "n")
    val rows = Packing.binPackFFD(df, "id", col("n"), budget = 128L,
      numPartitions = 1).as[(Long, Long, Long, Long)].collect()
    val big = rows.find(_._1 == 1L).get
    assert(rows.filter(_._3 == big._3).map(_._1).toSeq === Seq(1L))
    val others = rows.filter(_._1 != 1L)
    assert(others.map(_._3).distinct.length === 1) // 60+60 share a bin
  }

  // ------------------------------------------------------------ sampling

  test("rateThreshold endpoints and midpoint") {
    assert(Sampling.rateThreshold(0.0) === "00000000")
    assert(Sampling.rateThreshold(0.25) === "40000000")
    // rate 1.0 = full-keep sentinel: sorts above every hex string, so
    // even a key hashing to exactly ffffffff is kept (round-15 fix)
    assert(Sampling.rateThreshold(1.0) === "g")
    assert("ffffffff" < Sampling.rateThreshold(1.0))
  }

  test("uniform sampling is deterministic and near the target rate") {
    val df = spark.range(0, 4000).toDF("id")
    val kept = Sampling.uniform(df, col("id"), 0.5).count()
    val keptAgain = Sampling.uniform(df, col("id"), 0.5).count()
    assert(kept === keptAgain) // pure function of the key
    assert(math.abs(kept - 2000L) < 200, s"kept=$kept far from 2000")
    // different salt ⇒ different (still deterministic) subset
    val salted = Sampling.uniform(df, col("id"), 0.5, salt = "v2").count()
    assert(math.abs(salted - 2000L) < 200)
  }

  test("stratified rates apply per stratum and sample nests by rate") {
    val df = spark.range(0, 3000)
      .withColumn("g", when(col("id") % 2 === 0, "a").otherwise("b"))
    val out = Sampling.stratified(df, col("id"), col("g"),
      rates = Map("a" -> 0.1), defaultRate = 0.9)
    val byG = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byG("a") < 300 && byG("b") > 1150,
      s"stratum counts off: $byG")
    // lower-rate sample is a subset of a higher-rate one (same salt):
    // the hash-threshold rule nests samples by construction
    val small = Sampling.uniform(df, col("id"), 0.2)
      .select("id").as[Long].collect().toSet
    val big = Sampling.uniform(df, col("id"), 0.6)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("sampling composes with Structured Streaming (same rows as batch)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    mem.addData(0L until 500L: _*)
    val q = Sampling.uniform(mem.toDF().withColumnRenamed("value", "id"),
      col("id"), 0.3)
      .writeStream.format("memory").queryName("sampled_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sampled_stream").as[Long].collect().toSet
    val batch = Sampling.uniform(
      spark.range(0, 500).toDF("id"), col("id"), 0.3)
      .as[Long].collect().toSet
    assert(streamed === batch)
  }

  // --------------------------------------------------------------- bloom

  test("bloomSemiJoin equals the exact semi-join") {
    val big = spark.range(0, 5000).toDF("k")
    val small = spark.range(0, 5000).filter(col("id") % 17 === 0)
      .toDF("k")
    val got = Scale.bloomSemiJoin(big, small, "k", expectedItems = 1000L)
      .orderBy("k").as[Long].collect()
    val want = big.join(small, Seq("k"), "left_semi")
      .orderBy("k").as[Long].collect()
    assert(got.toSeq === want.toSeq)
  }

  test("bloomSemiJoin with an empty build side returns nothing") {
    val big = spark.range(0, 100).toDF("k")
    val small = spark.range(0, 100).filter(col("id") < 0).toDF("k")
    assert(Scale.bloomSemiJoin(big, small, "k", expectedItems = 10L)
      .count() === 0L)
  }

  test("skewReport surfaces the hot key with exact ppm share") {
    val df = (Seq.fill(60)(7L) ++ (100L until 140L)).toDF("k")
    val got = Scale.skewReport(df, col("k"), topK = 3)
      .as[(Long, Long, Long)].collect()
    assert(got.head === ((7L, 60L, 600000L))) // 60 of 100 rows = 60%
    assert(got.length === 3)
    assert(got(1)._2 === 1L) // remaining keys are singletons, key-ordered
    assert(got(1)._1 < got(2)._1)
  }

  // ------------------------------------------------------- snapshot diff

  test("snapshotDiff classifies added/deleted/changed and drops unchanged") {
    val prev = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, "d", 40L)).toDF("k", "s", "v")
    val curr = Seq((1L, "a", 10L), (2L, "B", 20L), (3L, "c", 31L),
      (5L, "e", 50L)).toDF("k", "s", "v")
    val got = Cdc.snapshotDiff(prev, curr, Seq("k"))
      .orderBy("k").as[(Long, String)].collect()
    assert(got.toSeq === Seq((2L, "changed"), (3L, "changed"),
      (4L, "deleted"), (5L, "added")))
  }

  test("snapshotDiff honors the watched-column list and null-safe compare") {
    val prev = Seq((1L, Option.empty[String], 10L), (2L, Some("x"), 20L))
      .toDF("k", "s", "v")
    val curr = Seq((1L, Option.empty[String], 99L), (2L, Some("x"), 20L))
      .toDF("k", "s", "v")
    // watched = s only: v change on k=1 is invisible; null==null holds
    assert(Cdc.snapshotDiff(prev, curr, Seq("k"), watched = Seq("s"))
      .count() === 0L)
    // watched = v: k=1 surfaces
    val got = Cdc.snapshotDiff(prev, curr, Seq("k"), watched = Seq("v"))
      .as[(Long, String)].collect()
    assert(got.toSeq === Seq((1L, "changed")))
  }
}

class KPerGroupSpec extends SparkSpec {
  import spark.implicits._
  import graft.ext.Sampling

  test("caps each group at k, deterministically and monotonically") {
    val df = (1L to 100L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "g")
    val k5 = Sampling.kPerGroup(df, col("id"), col("g"), 5)
      .as[(Long, String)].collect().toSet
    assert(k5.count(_._2 == "a") === 5 && k5.count(_._2 == "b") === 5)
    // repartitioning must not change membership
    val k5b = Sampling.kPerGroup(df.repartition(7), col("id"), col("g"), 5)
      .as[(Long, String)].collect().toSet
    assert(k5b === k5)
    // monotone: the k=5 sample is a subset of the k=9 sample
    val k9 = Sampling.kPerGroup(df, col("id"), col("g"), 9)
      .as[(Long, String)].collect().toSet
    assert(k5.subsetOf(k9))
    // groups smaller than k keep everything
    val tiny = Seq((1L, "z"), (2L, "z")).toDF("id", "g")
    assert(Sampling.kPerGroup(tiny, col("id"), col("g"), 5).count() === 2L)
  }

  test("duplicate keys stay deterministic and monotone given a tie-break") {
    // keys collide on purpose (id % 10): rows tie on the md5 hash, so
    // only the tie-break column distinguishes them
    val rows = for (g <- 0 until 4; k <- 0 until 30; p <- 0 until 2)
      yield (g.toString, (k % 10).toLong, s"payload-$p-$k")
    val df = rows.toDF("g", "id", "payload")
    def run(d: org.apache.spark.sql.DataFrame, k: Int) =
      Sampling.kPerGroup(d, col("id"), col("g"), k,
        tieBreak = Seq(col("payload")))
        .as[(String, Long, String)].collect().toSet
    val a = run(df, 5)
    assert(a.groupBy(_._1).values.forall(_.size == 5))
    // partition-layout independence despite the hash ties
    assert(run(df.repartition(13), 5) === a)
    // k5 ⊆ k9 monotonicity survives the ties
    assert(a.subsetOf(run(df, 9)))
  }

  test("kPerGroup plan gets the map-side WindowGroupLimit") {
    val df = (1L to 50L).map(i => (i, "g")).toDF("id", "g")
    val plan = Sampling.kPerGroup(df, col("id"), col("g"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan:\n$plan")
  }

  test("weightedKPerGroup: deterministic, monotone, weight-sensitive") {
    val df = (1L to 100L).map(i => (i, if (i % 3 == 0) "a" else "b",
      1.0 + (i % 7))).toDF("id", "g", "w")
    def run(d: org.apache.spark.sql.DataFrame, k: Int) =
      Sampling.weightedKPerGroup(d, col("id"), col("g"), col("w"), k)
        .select("id", "g").as[(Long, String)].collect().toSet
    val k5 = run(df, 5)
    assert(k5.count(_._2 == "a") === 5 && k5.count(_._2 == "b") === 5)
    assert(run(df.repartition(7), 5) === k5)
    assert(k5.subsetOf(run(df, 9)))
    // a dominating weight is effectively always selected: priority
    // ln(u)/w -> 0- as w grows, beating any unit-weight row
    val skew = ((1L to 100L).map(i => (i, "g", 1.0)) :+ (999L, "g", 1e12))
      .toDF("id", "g", "w")
    val top1 = Sampling.weightedKPerGroup(skew, col("id"), col("g"),
      col("w"), 1).select("id").as[Long].collect().toSeq
    assert(top1 === Seq(999L))
  }

  test("weightedKPerGroup emits ranks 1..k and gets WindowGroupLimit") {
    val df = (1L to 50L).map(i => (i, "g", i.toDouble)).toDF("id", "g", "w")
    val out = Sampling.weightedKPerGroup(df, col("id"), col("g"),
      col("w"), 3)
    assert(out.select("rank").as[Long].collect().toSeq.sorted
      === Seq(1L, 2L, 3L))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan:\n$plan")
    intercept[IllegalArgumentException] {
      Sampling.weightedKPerGroup(df, col("id"), col("g"), col("w"), 0) }
  }
}

class GroupSplitSpec extends SparkSpec {
  import spark.implicits._
  import graft.ext.Sampling

  private val docs = (1L to 600L)
    .map(i => (i, s"source-${i % 211}")).toDF("doc_id", "src")

  test("every row of a group lands in the same split (no leakage)") {
    val got = Sampling.groupSplit(docs, col("src"),
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val perGroup = got.groupBy(col("src"))
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") =!= 1).count()
    assert(perGroup === 0L, "a group straddled two splits")
    // all three splits materialize over 211 groups, ~80/10/10 by group
    val bySplit = got.select(col("src"), col("split")).distinct()
      .groupBy(col("split")).count()
      .as[(String, Long)].collect().toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val"))
  }

  test("membership is stable under repartition and corpus growth") {
    val base = Sampling.groupSplit(docs, col("src"),
      Seq(("a", 0.5), ("b", 0.5))).as[(Long, String, String)].collect().toSet
    val re = Sampling.groupSplit(docs.repartition(13), col("src"),
      Seq(("a", 0.5), ("b", 0.5))).as[(Long, String, String)].collect().toSet
    assert(re === base)
    // growing the corpus never re-assigns an existing group
    val grown = docs.unionByName(
      (601L to 700L).map(i => (i, s"other-${i % 41}")).toDF("doc_id", "src"))
    val after = Sampling.groupSplit(grown, col("src"),
      Seq(("a", 0.5), ("b", 0.5))).as[(Long, String, String)].collect().toSet
    assert(base.subsetOf(after))
  }

  test("weights are normalized; single split takes everything") {
    val one = Sampling.groupSplit(docs, col("src"), Seq(("all", 3.0)))
    assert(one.filter(col("split") =!= "all").count() === 0L)
    // unnormalized (8,1,1) ≡ (0.8,0.1,0.1)
    val a = Sampling.groupSplit(docs, col("src"),
      Seq(("t", 8.0), ("v", 1.0), ("e", 1.0)))
      .as[(Long, String, String)].collect().toSet
    val b = Sampling.groupSplit(docs, col("src"),
      Seq(("t", 0.8), ("v", 0.1), ("e", 0.1)))
      .as[(Long, String, String)].collect().toSet
    assert(a === b)
  }
}

class EpochShuffleSpec extends SparkSpec {
  import spark.implicits._
  import graft.ext.Shuffling

  private val docs = (1L to 500L).map(Tuple1(_)).toDF("doc_id")

  test("a valid permutation: every (shard, pos) unique, pos dense per shard") {
    val got = Shuffling.epochShuffle(docs, col("doc_id"), 8, "e1")
      .as[(Long, Long, Long)].collect()
    assert(got.length === 500)
    assert(got.map(r => (r._2, r._3)).distinct.length === 500)
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq,
        s"shard $shard positions not dense")
    }
  }

  test("reproducible per epoch; different epochs permute differently") {
    def run(epoch: String, d: org.apache.spark.sql.DataFrame = docs) =
      Shuffling.epochShuffle(d, col("doc_id"), 8, epoch)
        .as[(Long, Long, Long)].collect().toSet
    val e1 = run("e1")
    assert(run("e1", docs.repartition(11)) === e1,
      "epoch permutation must not depend on partition layout")
    val e2 = run("e2")
    assert(e1 !== e2, "different epochs must give different permutations")
  }

  test("no global single-partition sort in the plan") {
    val plan = Shuffling.epochShuffle(docs, col("doc_id"), 8, "e1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning"), s"plan:\n$plan")
    assert(!plan.contains("SinglePartition"), s"plan:\n$plan")
  }
}

/** Specs for mixture-targeted (dataset-mixing) sampling. */
class MixtureSampleSpec extends SparkSpec {
  import spark.implicits._
  import graft.ext.Sampling

  // 3 weighted groups of 200 + one unweighted group
  private lazy val docs = spark.range(800).select(
    col("id").as("doc_id"),
    concat(lit("src"), (col("id") % 4).cast("string")).as("source"))
  private val weights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)

  test("binding group kept whole; others near target proportions") {
    val got = Sampling.mixtureSample(docs, col("doc_id"), col("source"),
      weights).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // T = min(200/.5, 200/.3, 200/.2) = 400; targets 200/120/80
    assert(got("src0") === 200L, "rate-1.0 group must keep every row")
    assert(math.abs(got("src1") - 120L) < 25, got.toString)
    assert(math.abs(got("src2") - 80L) < 25, got.toString)
    assert(!got.contains("src3"), "unweighted groups must drop")
  }

  test("deterministic across runs and partition layouts") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.mixtureSample(d, col("doc_id"), col("source"), weights)
        .select("doc_id").as[Long].collect().toSet
    val a = run(docs)
    assert(run(docs.repartition(13)) === a)
  }

  test("weighted group absent from the data fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Sampling.mixtureSample(docs, col("doc_id"), col("source"),
        weights + ("srcX" -> 0.1)) }
    assert(e.getMessage.contains("srcX"))
  }

  test("weights are relative: scaling all weights changes nothing") {
    def run(w: Map[String, Double]) =
      Sampling.mixtureSample(docs, col("doc_id"), col("source"), w)
        .select("doc_id").as[Long].collect().toSet
    assert(run(weights) === run(weights.view.mapValues(_ * 7.0).toMap))
  }

  test("invalid weights rejected") {
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(docs, col("doc_id"), col("source"), Map.empty) }
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(docs, col("doc_id"), col("source"),
        Map("src0" -> -1.0)) }
  }
  test("weightedKPerGroup fails loudly on non-positive or null weights") {
    import spark.implicits._
    val df = Seq((1L, "g", 0.0)).toDF("id", "g", "w")
    val e = intercept[Exception] {
      Sampling.weightedKPerGroup(df, col("id"), col("g"), col("w"), 1)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("strictly")), e.toString)
  }

  test("tokenBudgetTake fails loudly on null or negative token counts") {
    import spark.implicits._
    val df = Seq((1L, "g", Option(5L)), (2L, "g", Option.empty[Long]))
      .toDF("id", "g", "nt")
    val e = intercept[Exception] {
      Sampling.tokenBudgetTake(df, col("g"), col("id"), col("nt"), 100L)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("non-null")), e.toString)
  }

  test("uniform at rate 1.0 keeps EVERY row (full-keep sentinel)") {
    import spark.implicits._
    val df = spark.range(0, 1000).toDF("id")
    assert(Sampling.uniform(df, col("id"), 1.0).count() === 1000L)
  }
}
