package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Compaction, Materialize}

/** Property tests for the invariants the reference asserts by example:
  * compaction idempotence, slice-order preservation, replay equivalence
  * (SURVEY.md §5 engine test plan). Raw ScalaCheck generators sampled
  * with fixed seeds (scalatestplus bridge is not in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val batchGen: Gen[List[(Long, String, Option[String])]] = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, for {
      key <- Gen.oneOf("A", "B", "C", "D")
      v <- Gen.option(Gen.alphaStr.map(_.take(4)))
    } yield (key, v))
  } yield rows.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }

  private def samples(n: Int): Seq[List[(Long, String, Option[String])]] =
    (1 to n).flatMap(i =>
      batchGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("compaction is idempotent") {
    samples(15).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("id", "key", "v")
      val once = Compaction.lastWins(df, Seq("key"), col("id"))
      val twice = Compaction.lastWins(once, Seq("key"), col("id"))
      assert(once.collect().toSet === twice.collect().toSet)
    }
  }

  test("applyEvents equals sequential replay for arbitrary batches") {
    samples(15).foreach { rows =>
      val df = rows.toDF("id", "key", "v")
      val got = Materialize.applyEvents(df, Seq("key"), col("id"),
        col("v").isNull)
        .select("key", "v").as[(String, Option[String])].collect()
        .map { case (k, v) => k -> v.orNull }.toMap
      val want = rows.sortBy(_._1).foldLeft(Map.empty[String, String]) {
        case (st, (_, k, None)) => st - k
        case (st, (_, k, Some(v))) => st + (k -> v)
      }
      assert(got === want)
    }
  }

  test("waves partition the batch; each wave is key-disjoint") {
    samples(15).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("id", "key", "v")
      val waved = Compaction.withWave(df, Seq("key"), col("id")).collect()
      assert(waved.length === rows.length)
      val byWave = waved.groupBy(_.getAs[Long]("wave"))
      byWave.values.foreach { ws =>
        val keys = ws.map(_.getAs[String]("key"))
        assert(keys.distinct.length === keys.length)
      }
    }
  }

  private val eventsGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      user <- Gen.choose(1L, 5L)
      ts <- Gen.choose(0L, 200L)
    } yield (user, ts))
  } yield rows.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }

  private def eventSamples(n: Int): Seq[List[(Long, Long, Long)]] =
    (1 to n).flatMap(i =>
      eventsGen.apply(Gen.Parameters.default, Seed(100L + i)))

  test("rolling trailing counts equal brute force on arbitrary event sets") {
    val w = 25L
    eventSamples(12).foreach { rows =>
      val df = rows.toDF("id", "user", "ts")
      val got = graft.operators.Rolling.trailing(df, "user", "ts", w,
        Seq("n" -> count(lit(1))))
        .select("id", "n").as[(Long, Long)].collect().toMap
      rows.foreach { case (id, u, t) =>
        val want = rows.count { case (_, u2, t2) =>
          u2 == u && t2 >= t - w && t2 <= t }
        assert(got(id) === want.toLong, s"id=$id rows=$rows")
      }
    }
  }

  test("cohort retention equals brute force on arbitrary event sets") {
    val period = 30L
    eventSamples(12).foreach { rows =>
      val df = rows.toDF("id", "user", "ts")
      val got = graft.operators.Cohorts.retention(df, "user", "ts", period)
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val firstSeen = rows.groupBy(_._2).view.mapValues(_.map(_._3).min)
      val want = rows
        .map { case (_, u, t) =>
          (firstSeen(u) / period, t / period - firstSeen(u) / period, u) }
        .distinct.groupBy(c => (c._1, c._2)).view.mapValues(_.size.toLong)
        .toMap
      assert(got === want, s"rows=$rows")
    }
  }

  // ---- round-6 operators -------------------------------------------------

  private val edgeGen: Gen[List[(String, String)]] = for {
    n <- Gen.choose(1, 60)
    edges <- Gen.listOfN(n, for {
      s <- Gen.choose(0, 12).map(i => s"n$i")
      t <- Gen.choose(0, 12).map(i => s"n$i")
    } yield (s, t))
  } yield edges.filter(e => e._1 != e._2)

  test("pagerank equals the driver reference on random graphs") {
    def ref(edges: Seq[(String, String)], iters: Int): Map[String, Double] = {
      val e = edges.distinct
      val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
      val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
      val nN = nodes.size.toDouble
      var r = nodes.map(_ -> 1.0 / nN).toMap
      for (_ <- 1 to iters) {
        val dm = nodes.filterNot(deg.contains).map(r).sum
        val c = e.groupBy(_._2).map { case (d, es) =>
          d -> es.map { case (s, _) => r(s) / deg(s) }.sum }
        r = nodes.map(v =>
          v -> (0.15 / nN + 0.85 * (c.getOrElse(v, 0.0) + dm / nN))).toMap
      }
      r
    }
    (1 to 8).flatMap(i => edgeGen.apply(Gen.Parameters.default, Seed(100L + i)))
      .filter(_.nonEmpty).foreach { edges =>
        val got = graft.operators.Graph.pageRank(
          edges.toDF("s", "t"), "s", "t", iterations = 3)
          .as[(String, Double)].collect().toMap
        val want = ref(edges, 3)
        assert(got.keySet === want.keySet, s"edges=$edges")
        got.foreach { case (k, v) =>
          assert(math.abs(v - want(k)) < 1e-12, s"node $k edges=$edges") }
        assert(math.abs(got.values.sum - 1.0) < 1e-9)
      }
  }

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 12)
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("duplicate extents equal brute force on random tiny-vocab corpora") {
    def ref(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long, Long)] = {
      val wins = docs.flatMap { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        (0 to toks.length - k).map(p => (id, p.toLong, toks.slice(p, p + k).mkString(" ")))
      }
      val freq = wins.groupBy(_._3).view.mapValues(_.size).toMap
      wins.filter(w => freq(w._3) > 1)
        .groupBy(_._1).flatMap { case (id, ws) =>
          val ps = ws.map(_._2).sorted
          // merge runs where the gap <= k
          val groups = ps.foldLeft(List.empty[List[Long]]) {
            case (Nil, p) => List(List(p))
            case (h :: t, p) if p - h.head <= k => (p :: h) :: t
            case (acc, p) => List(p) :: acc
          }
          groups.map(g => (id, g.min, g.max + k, g.size.toLong))
        }.toSet
    }
    (1 to 10).flatMap(i => corpusGen.apply(Gen.Parameters.default, Seed(200L + i)))
      .foreach { docs =>
        val got = graft.ext.Dedup.duplicateExtents(
          docs.toDF("id", "text"), "id", "text", spanTokens = 2)
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(got === ref(docs, 2), s"docs=$docs")
      }
  }

  test("mutual-best matching is one-to-one and mutually optimal") {
    val strGen: Gen[List[String]] = for {
      n <- Gen.choose(1, 15)
      ss <- Gen.listOfN(n, for {
        len <- Gen.choose(2, 6)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield ss
    (1 to 8).foreach { i =>
      val ls = strGen.apply(Gen.Parameters.default, Seed(300L + i)).get
        .zipWithIndex.map { case (s, j) => (j.toLong, s) }
      val rs = strGen.apply(Gen.Parameters.default, Seed(400L + i)).get
        .zipWithIndex.map { case (s, j) => (j.toLong, s) }
      val got = graft.ext.FuzzyJoin.mutualBestMatch(
        ls.toDF("lid", "lval"), "lid", "lval",
        rs.toDF("rid", "rval"), "rid", "rval",
        maxDist = 2, prefixLen = 1, lenBand = 4)
        .as[(Long, String, Long, String, Long)].collect()
      // one-to-one
      assert(got.map(_._1).distinct.length === got.length)
      assert(got.map(_._3).distinct.length === got.length)
      // reference candidate set under the same blocking
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val cand = for {
        (li, lv) <- ls; (ri, rv) <- rs
        if lv.take(1) == rv.take(1) && lv.length / 4 == rv.length / 4
        d = lev(lv, rv) if d <= 2
      } yield (li, lv, ri, rv, d)
      got.foreach { case (li, lv, ri, rv, d) =>
        val bestOfLeft = cand.filter(_._1 == li)
          .minBy(c => (c._5, c._4, c._3))
        val bestOfRight = cand.filter(_._3 == ri)
          .minBy(c => (c._5, c._2, c._1))
        assert((bestOfLeft._3, bestOfLeft._5) === ((ri, d)), s"seed=$i left=$li")
        assert((bestOfRight._1, bestOfRight._5) === ((li, d)), s"seed=$i right=$ri")
      }
      // completeness: every mutual-best candidate pair is emitted
      val mutual = cand.filter { c =>
        cand.filter(_._1 == c._1).minBy(x => (x._5, x._4, x._3))._3 == c._3 &&
        cand.filter(_._3 == c._3).minBy(x => (x._5, x._2, x._1))._1 == c._1
      }
      assert(got.length === mutual.length, s"seed=$i")
    }
  }

  test("novelty profile equals brute force on random tiny-vocab corpora") {
    val corpusGen: Gen[List[String]] = for {
      n <- Gen.choose(1, 12)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 12)
        ts <- Gen.listOfN(len, Gen.oneOf("u", "v", "w", "x", "y", "z"))
      } yield ts.mkString(" "))
    } yield docs
    (1 to 10).foreach { i =>
      val docs = corpusGen.apply(Gen.Parameters.default, Seed(500L + i))
        .get.zipWithIndex.map { case (s, j) => (j.toLong, s) }
      val got = graft.ext.Dedup.noveltyProfile(
        docs.toDF("doc_id", "text"), "doc_id", "text", n = 3)
        .select("doc_id", "n_grams", "n_novel")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      val grams = docs.map { case (id, s) =>
        id -> s.split("\\s+").filter(_.nonEmpty).toSeq
          .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      }
      val first = grams.flatMap { case (id, gs) => gs.map(_ -> id) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
      val want = grams.filter(_._2.nonEmpty).map { case (id, gs) =>
        (id, gs.size.toLong, gs.count(g => first(g) == id).toLong)
      }
      assert(got.toSeq === want, s"seed=$i")
    }
  }

  test("winsorize equals brute force on random grouped values") {
    val rowsGen: Gen[List[(String, Option[Long])]] = for {
      n <- Gen.choose(1, 50)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("A", "B", "C")
        v <- Gen.option(Gen.choose(0L, 20L))
      } yield (g, v))
    } yield rows
    (1 to 10).foreach { i =>
      val rows = rowsGen.apply(Gen.Parameters.default, Seed(600L + i)).get
      if (rows.exists(_._2.isDefined)) {
        val got = graft.operators.Profile.winsorize(
          rows.toDF("grp", "v"), "grp", "v", pLo = 0.25, pHi = 0.75)
          .select("grp", "n", "n_lo", "n_hi", "lo", "hi", "winsorized_sum")
          .as[(String, Long, Long, Long, Long, Long, Long)]
          .collect().sortBy(_._1)
        val want = rows.collect { case (g, Some(v)) => (g, v) }
          .groupBy(_._1).toSeq.sortBy(_._1).map { case (g, gv) =>
            val vs = gv.map(_._2).sorted
            // the operator's rank rule: smallest value whose cumulative
            // count reaches ceil(p·n) — on sorted raw values that is
            // the element at index ceil(p·n)-1
            def q(p: Double): Long =
              vs(math.ceil(p * vs.size).toLong.toInt - 1)
            val (lo, hi) = (q(0.25), q(0.75))
            (g, vs.size.toLong, vs.count(_ < lo).toLong,
              vs.count(_ > hi).toLong, lo, hi,
              vs.map(v => math.min(math.max(v, lo), hi)).sum)
          }
        assert(got.toSeq === want, s"seed=$i")
      }
    }
  }

  test("interval overlap equals brute force at random widths") {
    val ivGen: Gen[List[(Long, Long, Long)]] = for {
      n <- Gen.choose(1, 25)
      ivs <- Gen.listOfN(n, for {
        lo <- Gen.choose(-50L, 150L)
        len <- Gen.choose(0L, 60L)
      } yield (lo, lo + len))
    } yield ivs.zipWithIndex.map { case ((l, h), i) => (i.toLong, l, h) }
    (1 to 8).foreach { i =>
      val as = ivGen.apply(Gen.Parameters.default, Seed(800L + i)).get
      val bs = ivGen.apply(Gen.Parameters.default, Seed(900L + i)).get
      val width = Seq(7L, 10L, 64L)(i % 3)
      val got = graft.operators.RangeJoin.intervalOverlap(
        as.toDF("a_id", "a_lo", "a_hi"), bs.toDF("b_id", "b_lo", "b_hi"),
        "a_lo", "a_hi", "b_lo", "b_hi", binWidth = width)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
      val want = (for {
        (ai, al, ah) <- as; (bi, bl, bh) <- bs
        if al <= bh && bl <= ah
      } yield (ai, bi)).sorted
      assert(got === want, s"seed=$i width=$width")
    }
  }

  test("k-anonymity profile equals brute force on random QI tables") {
    val rowsGen: Gen[List[(String, Long)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        a <- Gen.oneOf("p", "q", "r")
        b <- Gen.choose(0L, 3L)
      } yield (a, b))
    } yield rows
    (1 to 10).foreach { i =>
      val rows = rowsGen.apply(Gen.Parameters.default, Seed(700L + i)).get
      val ks = Seq(2, 4, 9)
      val got = graft.ext.Privacy.kAnonymityProfile(
        rows.toDF("a", "b"), Seq(col("a"), col("b")), ks)
        .select("k", "n_classes", "classes_below", "rows_at_risk", "n_rows")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      val sizes = rows.groupBy(identity).values.map(_.size.toLong).toSeq
      val want = ks.map { k =>
        (k.toLong, sizes.size.toLong, sizes.count(_ < k).toLong,
          sizes.filter(_ < k).sum, sizes.sum)
      }
      assert(got.toSeq === want, s"seed=$i")
    }
  }
}
