package graft

import org.apache.spark.sql.functions._

import graft.ext.Multimodal
import graft.streaming.StreamNearDup

/** The radius-7 regime of the near-dup family: 4 ≤ maxHamming ≤ 7,
  * where real dHash near-duplicates — crops, brightness shifts,
  * aggressive re-encodes — actually live. The BATCH operators keep
  * four 16-bit chunks and go 1-bit multi-probe (7 errors over 4
  * chunks ⇒ some chunk with ≤ 1 error: one side's exact keys meet
  * the other side's 17-key 1-bit balls); only the STREAMING stateful
  * op widens to eight 8-bit chunks (hamming ≤ 7 ⇒ some 8-bit chunk
  * EQUAL — bucket state can't admit probe rows). Pins: brute-force
  * equality at every threshold 4–7 (unipartite, bipartite,
  * streaming-stateful, frozen-screen), hamming-8 pairs excluded, and
  * the hot-bucket cap discipline. */
class Radius7Spec extends SparkSpec {
  import spark.implicits._

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Random corpus + planted neighbors at hamming 0..9 (flip positions
    * spread across several 8-bit chunks so radius-7 recall is probed
    * where no 16-bit chunk survives). */
  private def corpus(seed: Int, n: Int = 60): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val base = (0 until n).map(i => (i.toLong, rnd.nextLong()))
    val near = (0 until 20).map { i =>
      val flips = i % 10 // hamming 0..9 — straddles the 7 threshold
      var h = base(i)._2
      // stride 11 walks the flips across chunk boundaries: hamming-4+
      // masks touch ≥ 3 distinct 16-bit chunks, so the old 4-chunk
      // pigeonhole would genuinely have missed these
      (0 until flips).foreach(b => h ^= 1L << ((i * 5 + b * 11) % 64))
      (500L + i, h)
    }
    base ++ near
  }

  test("hashNearDup equals brute force at every threshold 4..7; ham-8 excluded") {
    val all = corpus(7)
    val df = all.toDF("id", "ph")
    for (mh <- 4 to 7) {
      val got = Multimodal.hashNearDup(df, "id", "ph", maxHamming = mh)
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (ia, ha) <- all; (ib, hb) <- all if ia < ib
        d = ham(ha, hb) if d <= mh
      } yield (ia, ib, d.toLong)).toSet
      assert(want.exists(_._3 >= 4), s"fixture must hold radius-4+ pairs (mh=$mh)")
      assert(got === want, s"maxHamming=$mh")
    }
    // the threshold cuts: a planted hamming-8 pair is NOT emitted at 7
    val got7 = Multimodal.hashNearDup(df, "id", "ph", maxHamming = 7)
      .as[(Long, Long, Long)].collect().toSet
    val planted8 = all.filter(_._1 >= 500).filter(d =>
      ham(d._2, all((d._1 - 500).toInt)._2) == 8)
    assert(planted8.nonEmpty)
    planted8.foreach { case (id, _) =>
      assert(!got7.exists(p => p._1 == id - 500 && p._2 == id))
    }
  }

  test("maxHamming > 7 is rejected across the family") {
    val df = Seq((1L, 2L)).toDF("id", "ph")
    intercept[IllegalArgumentException](
      Multimodal.hashNearDup(df, "id", "ph", maxHamming = 8))
    intercept[IllegalArgumentException](
      Multimodal.hashNearDupAgainst(df, df, "id", "ph", maxHamming = 8))
    intercept[IllegalArgumentException](
      StreamNearDup.pairs(
        Seq((1L, 2L)).toDF("id", "hash").as[StreamNearDup.HashedDoc],
        maxHamming = 8))
    intercept[IllegalArgumentException](
      StreamNearDup.screenAgainst(df, df, "id", "ph", maxHamming = 8))
  }

  test("bipartite screen at radius 7 equals bipartite brute force") {
    val all = corpus(13)
    // NOT parity: planted ids are base id + 500, same parity — an
    // even/odd split would keep every planted pair on one side
    val (l, r) = all.partition(_._1 % 3 == 0)
    val got = Multimodal.hashNearDupAgainst(
      l.toDF("id", "ph"), r.toDF("id", "ph"), "id", "ph", maxHamming = 7)
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (ia, ha) <- l; (ib, hb) <- r
      d = ham(ha, hb) if d <= 7
    } yield (ia, ib, d.toLong)).toSet
    assert(want.exists(_._3 >= 4))
    assert(got === want)
  }

  test("radius-7 cap: hot chunk bucket drops and reports; pairs never invented") {
    // a constant LOW 16 bits makes chunk 0 one bucket holding the
    // WHOLE corpus — cap it; the planted pair (equal at cold chunks
    // 2 and 3, 6 bits apart inside chunk 1) must still arrive via the
    // surviving buckets, and the hot bucket must be reported.
    val rnd = new scala.util.Random(31)
    val docs = (0 until 40).map { i =>
      (i.toLong, (rnd.nextLong() & ~0xffffL) | 0x5a5aL)
    } ++ Seq((900L, 0xabcdef0123450000L | 0x5a5aL),
      (901L, (0xabcdef0123450000L | 0x5a5aL) ^ (0x3fL << 16))) // ham 6 in chunk 1
    val df = docs.toDF("id", "ph")
    val (pairs, overflow) = Multimodal.hashNearDupCapped(df, "id", "ph",
      maxHamming = 7, maxBucket = Some(8))
    val got = pairs.as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (ia, ha) <- docs; (ib, hb) <- docs if ia < ib
      d = ham(ha, hb) if d <= 7
    } yield (ia, ib, d.toLong)).toSet
    // the planted pair's qualifying chunks (2, 3) are cold
    assert(got.contains((900L, 901L, 6L)))
    assert(got.subsetOf(want), "capped output must never invent pairs")
    val hot = overflow.as[(Int, Long, Long)].collect()
    assert(hot.exists { case (c, v, n) => c == 0 && v == 0x5a5aL && n == 42 },
      s"chunk-0 bucket 0x5a5a must be reported hot: ${hot.mkString(",")}")
  }

  test("radius-7 cap: one cold endpoint bucket rescues the pair (both orientations kept)") {
    // the SMALLER id (5) shares its full hash with 20 fillers, so all
    // four of its exact (chunk, val) buckets are hot at cap 8; the
    // larger id (900) differs by 1 bit inside chunk 0 — its chunk-0
    // bucket is cold. The pair must arrive via the orientation that
    // meets in 900's bucket (900 exact × 5's 1-bit probe). An
    // id_a < id_b post-join filter would silently lose it: the
    // surviving orientation emits (id_a=900, id_b=5).
    val h = 0x1122334455667788L
    val docs = Seq((5L, h)) ++
      (100 until 120).map(i => (i.toLong, h)) ++
      Seq((900L, h ^ 2L)) // 1 bit inside chunk 0
    val df = docs.toDF("id", "ph")
    val (pairs, overflow) = Multimodal.hashNearDupCapped(df, "id", "ph",
      maxHamming = 7, maxBucket = Some(8))
    val got = pairs.as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (ia, ha) <- docs; (ib, hb) <- docs if ia < ib
      d = ham(ha, hb) if d <= 7
    } yield (ia, ib, d.toLong)).toSet
    assert(got.contains((5L, 900L, 1L)),
      s"pair must survive via the cold larger-id bucket: $got")
    assert(got.subsetOf(want), "capped output must never invent pairs")
    // every one of the shared hash's four chunk buckets is reported
    val hot = overflow.as[(Int, Long, Long)].collect()
    assert((0 to 3).forall(c => hot.exists(_._1 == c)), hot.mkString(","))
  }

  test("radius-7 cap-everywhere regime: all exact buckets hot -> zero pairs, exact occupancy report") {
    // the regime the 100x-decade leg exercises (BASELINE.md round-14
    // addendum 10): replication puts ~K copies behind every hash, so
    // EVERY exact (chunk, value) bucket blows the cap. Contract: the
    // governor refuses ALL pairing work (no orientation survives —
    // both endpoints' buckets are hot at every qualifying chunk) and
    // the drop report carries each bucket's exact occupancy. Pairs
    // are dropped, never invented; the report is the full accounting.
    val h = 0x1122334455667788L
    val docs = (0 until 30).map(i => (i.toLong, h))
    val (pairs, overflow) = Multimodal.hashNearDupCapped(
      docs.toDF("id", "ph"), "id", "ph", maxHamming = 7, maxBucket = Some(8))
    assert(pairs.isEmpty, "all buckets hot: no pair may survive")
    val got = overflow.as[(Int, Long, Long)].collect().toSet
    val want = Set((0, 0x7788L, 30L), (1, 0x5566L, 30L),
      (2, 0x3344L, 30L), (3, 0x1122L, 30L))
    assert(got == want, s"drop report must be the exact occupancy: $got")
  }

  test("streaming stateful pairs at radius 7 equal the batch operator") {
    val all = corpus(23, n = 40)
    val got = StreamNearDup.pairs(
      all.toDF("id", "hash").as[StreamNearDup.HashedDoc], maxHamming = 7)
      .collect().map(p => (p.idA, p.idB, p.hamming.toLong)).toSet
    val want = Multimodal.hashNearDup(all.toDF("id", "ph"), "id", "ph",
      maxHamming = 7).as[(Long, Long, Long)].collect().toSet
    assert(want.exists(_._3 >= 4))
    assert(got === want)
  }

  test("frozen-reference screen at radius 7 (batch mode) equals brute force") {
    val all = corpus(41)
    val (ref, arr) = all.partition(_._1 % 3 == 0) // see bipartite note
    val (pairs, _) = StreamNearDup.screenAgainst(
      ref.toDF("id", "ph"), arr.toDF("id", "ph"), "id", "ph", maxHamming = 7)
    val got = pairs.as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (ib, hb) <- ref; (ia, ha) <- arr
      d = ham(ha, hb) if d <= 7
    } yield (ia, ib, d.toLong)).toSet
    assert(want.exists(_._3 >= 4))
    assert(got === want)
  }

  test("property: random corpora, every radius 0..7, capped ⊆ exact = brute force") {
    for (trial <- 0 until 6) {
      val rnd = new scala.util.Random(1000 + trial)
      val n = 25 + rnd.nextInt(20)
      val base = (0 until n).map(i => (i.toLong, rnd.nextLong()))
      val near = (0 until 12).map { i =>
        var h = base(rnd.nextInt(n))._2
        (0 until rnd.nextInt(10)).foreach(_ => h ^= 1L << rnd.nextInt(64))
        (800L + i, h)
      }
      val all = base ++ near
      val df = all.toDF("id", "ph")
      val mh = rnd.nextInt(8)
      val want = (for {
        (ia, ha) <- all; (ib, hb) <- all if ia < ib
        d = ham(ha, hb) if d <= mh
      } yield (ia, ib, d.toLong)).toSet
      val exact = Multimodal.hashNearDup(df, "id", "ph", maxHamming = mh)
        .as[(Long, Long, Long)].collect().toSet
      assert(exact === want, s"trial=$trial mh=$mh exact != brute force")
      // a tight cap may only DROP pairs, never invent or corrupt them
      val (cappedDf, overflow) = Multimodal.hashNearDupCapped(df, "id", "ph",
        maxHamming = mh, maxBucket = Some(1 + rnd.nextInt(4)))
      val capped = cappedDf.as[(Long, Long, Long)].collect().toSet
      assert(capped.subsetOf(want), s"trial=$trial mh=$mh capped invented pairs")
      // anything dropped must be explained by a reported hot bucket
      if ((want -- capped).nonEmpty)
        assert(overflow.count() > 0, s"trial=$trial mh=$mh silent drop")
    }
  }

  test("curation accepts a radius-7 threshold end to end") {
    // two docs pairing only at hamming 6 collapse to one survivor at
    // maxHamming = 7, stay separate at the default 3
    val h0 = 0x0123456789abcdefL
    val docs = Seq((1L, h0, 5L), (2L, h0 ^ 0x3fL, 9L))
      .toDF("doc_id", "ph", "quality")
    val surv7 = graft.ext.Dedup.curateIncrement(
      Seq.empty[(Long, Long, Long, Long)].toDF("doc_id", "ph", "quality", "n_copies"),
      docs, "doc_id", "ph", "quality", maxHamming = 7)
      .select(col("doc_id"), col("n_copies")).as[(Long, Long)].collect().toMap
    assert(surv7 === Map(2L -> 2L))
    val surv3 = graft.ext.Dedup.curateIncrement(
      Seq.empty[(Long, Long, Long, Long)].toDF("doc_id", "ph", "quality", "n_copies"),
      docs, "doc_id", "ph", "quality", maxHamming = 3)
      .select(col("doc_id"), col("n_copies")).as[(Long, Long)].collect().toMap
    assert(surv3 === Map(1L -> 1L, 2L -> 1L))
  }
}
