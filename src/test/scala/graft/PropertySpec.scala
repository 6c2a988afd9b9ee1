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
}
